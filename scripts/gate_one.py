import os, sys, json
import duckdb, numpy as np, ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
for name in sys.argv[1:]:
    eng = __ray_entry__.queries()[name](SF)
    if hasattr(eng, "to_pandas"):
        eng = eng.to_pandas()
    ora = con.execute(__ray_entry__.oracle_sql()[name]).fetchdf()
    schema_ok = list(eng.columns) == list(ora.columns)  # original ORDER too
    eng = eng[sorted(eng.columns)].reset_index(drop=True)
    ora = ora[sorted(ora.columns)].reset_index(drop=True)
    ok = schema_ok and len(eng) == len(ora)
    if not schema_ok:
        print(name, "SCHEMA ORDER MISMATCH", list(eng.columns), list(ora.columns))
    if ok:
        for c in eng.columns:
            a, b = eng[c].to_numpy(), ora[c].to_numpy()
            good = np.array_equal(a, b, equal_nan=True) if eng[c].dtype.kind == "f" else (eng[c].astype(str) == ora[c].astype(str)).all()
            if not good:
                ok = False; print(name, "MISMATCH col", c); break
    print(name, "GREEN" if ok else "RED", len(eng), len(ora))
ray.shutdown()
