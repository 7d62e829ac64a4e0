"""Replay the driver gate: all 50 in-cap queries() entries vs oracle_sql()
through DuckDB at sf0.01, reporting rows/schema/value matches per entry.

Run:  PYTHONPATH=/root/repo python scripts/gate_check.py
(owns its own Ray session; ~10 min at sf0.01).  Results also land in
/tmp/gate_results.json.  scripts/gate_one.py checks named entries only:
PYTHONPATH=/root/repo python scripts/gate_one.py <entry> [<entry> ...]"""
import json
import os
import sys
import traceback

import duckdb
import numpy as np
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

q = __ray_entry__.queries()
o = __ray_entry__.oracle_sql()
incap = list(q.keys())[:50]

results = {}
for name in incap:
    rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
    try:
        eng = q[name](SF)
        if hasattr(eng, "to_pandas"):
            eng = eng.to_pandas()
        if name not in o:
            rec["err"] = "no_oracle"
            rec["spark_rows"] = len(eng)
            results[name] = rec
            print(json.dumps({name: rec}), flush=True)
            continue
        ora = con.execute(o[name]).fetchdf()
        # Compare the ORIGINAL column order first (the real driver may hash
        # on it); only then canonicalize to sorted order for value compare.
        rec["schema_match"] = list(eng.columns) == list(ora.columns)
        eng = eng[sorted(eng.columns)].reset_index(drop=True)
        ora = ora[sorted(ora.columns)].reset_index(drop=True)
        rec["spark_rows"] = len(eng)
        rec["oracle_rows"] = len(ora)
        rec["rows_match"] = len(eng) == len(ora)
        hm = rec["rows_match"] and rec["schema_match"]
        if hm:
            for c in eng.columns:
                a, b = eng[c].to_numpy(), ora[c].to_numpy()
                if eng[c].dtype.kind == "f":
                    ok = np.array_equal(a, b, equal_nan=True)
                else:
                    ok = (eng[c].astype(str) == ora[c].astype(str)).all()
                if not ok:
                    hm = False
                    rec["err"] = f"value mismatch in column {c}"
                    break
        rec["hash_match"] = bool(hm)
    except Exception as ex:
        rec["err"] = f"{type(ex).__name__}: {ex}"
        traceback.print_exc()
    results[name] = rec
    print(json.dumps({name: rec}), flush=True)

green = sum(1 for r in results.values() if r["hash_match"])
print(f"\nGREEN {green}/{len(incap)}")
for name, r in results.items():
    if not r["hash_match"]:
        print("RED:", name, r)
with open("/tmp/gate_results.json", "w") as f:
    json.dump(results, f, indent=1)
ray.shutdown()
