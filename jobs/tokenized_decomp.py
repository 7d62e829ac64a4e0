"""Decompose the tokenized stage's wall time at one parallelism level.

The --scaling protocol shows `tokenized` as the binding stage at 8 CPUs
(eff 0.66 vs the bare-mp workload ceiling 0.86 on identical kernels —
BASELINE.md run S).  The Ray stage does four things the bare ceiling does
not: (1) the url-dedup loser scan (repartition(1) single task), (2) the
loser is_in filter, (3) the hive-partitioned write (partition_cols), and
(4) object-store block movement + scheduling.  This job times each piece
separately on the same corpus so the gap is attributed, not guessed.

Usage:  RAY_GRAFT_CPUS=8 TOKDECOMP_N=400000 python jobs/tokenized_decomp.py
Owns its Ray session (CLI entry point).
"""

import json
import os
import shutil
import time

import ray
import ray.data as rd

NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
PAGES_N = int(os.environ.get("TOKDECOMP_N", "400000"))
CACHE = f"/tmp/lsr_bench_pages_{PAGES_N}"
OUT = "/tmp/lsr_tokdecomp"


def main() -> None:
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from lucene_solr_ray.fixtures import write_pages_parquet
    from lucene_solr_ray.index.build import _dedup_losers, _read_sized
    from lucene_solr_ray.stages.extract import extract_batch
    from lucene_solr_ray.stages.tokenize import tokenize_batch

    if not os.path.exists(os.path.join(CACHE, "_DONE")):
        shutil.rmtree(CACHE, ignore_errors=True)
        write_pages_parquet(CACHE, PAGES_N, n_files=64)
        open(os.path.join(CACHE, "_DONE"), "w").write("ok")
    import glob

    files = sorted(glob.glob(os.path.join(CACHE, "pages-*.parquet")))
    res = {"num_cpus": NCPU, "pages_n": PAGES_N}

    # warm the worker pool (same as bench.py) so startup isn't in any lane
    @ray.remote
    def _w(i):
        time.sleep(0.3)
        return i

    ray.get([_w.remote(i) for i in range(NCPU * 2)])

    # (1) loser scan alone
    t0 = time.time()
    losers = _dedup_losers(files, None)
    n_losers = losers.count()
    res["losers_sec"] = round(time.time() - t0, 3)
    res["n_losers"] = n_losers

    def pipe(with_tokenize=True):
        ds = _read_sized(files)
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=512)
        if with_tokenize:
            ds = ds.map_batches(
                tokenize_batch,
                batch_format="pyarrow",
                batch_size=512,
                fn_kwargs={"with_positions": True, "analyzer": "standard",
                           "extra_text_fields": ()},
            )
            ds = ds.select_columns(
                ["doc_id", "dl", "norm", "terms", "tfs", "positions", "url"]
            )
        return ds

    # (2) extract+tokenize, flat write (the bare ceiling's exact shape)
    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    pipe().write_parquet(OUT, mode="overwrite", compression="snappy")
    res["ray_flat_write_sec"] = round(time.time() - t0, 3)

    # (3) extract+tokenize, hive-partitioned write (the build's exact shape,
    # bench partitioning: rows_per_partition=2048)
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_pid(t: pa.Table) -> pa.Table:
        return t.append_column(
            "partition_id",
            pc.cast(pc.floor(pc.divide(pc.cast(t["doc_id"], pa.float64()), 2048)),
                    pa.int64()),
        )

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    pipe().map_batches(add_pid, batch_format="pyarrow").write_parquet(
        OUT, partition_cols=["partition_id"], mode="overwrite",
        compression="snappy")
    res["ray_hive_write_sec"] = round(time.time() - t0, 3)

    # (4) extract only + flat write (isolates tokenize kernel share)
    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    pipe(with_tokenize=False).write_parquet(OUT, mode="overwrite",
                                            compression="snappy")
    res["ray_extract_only_sec"] = round(time.time() - t0, 3)

    shutil.rmtree(OUT, ignore_errors=True)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
