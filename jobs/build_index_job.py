"""Index-build job entry point for ``ray job submit``.

    ray job submit --working-dir . -- \\
        python jobs/build_index_job.py --input /data/pages --out /data/index \\
            --rows-per-partition 65536 --multi-facet-fields links_sim

Connects to the submitting cluster (``ray.init(address="auto")`` when run
under the job supervisor; falls back to a local session standalone), runs
the full build pipeline, and prints ONE JSON line of metrics: per-stage
lineage seconds from the commit manifest, docs/sec, partition count.  The
build is resumable: rerunning with the same --out skips finished stages and
finished postings partitions.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="Parquet file/dir (or glob) of pages")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--rows-per-partition", type=int, default=65_536)
    ap.add_argument("--analyzer", default="standard",
                    choices=["standard", "simple", "english", "by_lang"])
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--no-html-extract", action="store_true")
    ap.add_argument("--no-url-dedup", action="store_true")
    ap.add_argument("--facet-fields", default="host,tld,lang")
    ap.add_argument("--multi-facet-fields", default="")
    ap.add_argument("--fresh", action="store_true", help="ignore existing checkpoints")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True)

    from lucene_solr_ray.index.build import build_index

    if any(c in args.input for c in "*?["):
        paths = sorted(glob.glob(args.input))
        if not paths:
            ap.error(f"--input glob matched no files: {args.input!r}")
    else:
        paths = args.input
    t0 = time.time()
    man = build_index(
        paths,
        args.out,
        rows_per_partition=args.rows_per_partition,
        extract_html=not args.no_html_extract,
        dedup_url=not args.no_url_dedup,
        with_positions=not args.no_positions,
        analyzer=args.analyzer,
        facet_fields=tuple(f for f in args.facet_fields.split(",") if f),
        multi_facet_fields=tuple(f for f in args.multi_facet_fields.split(",") if f),
        resume=not args.fresh,
    )
    wall = time.time() - t0
    stage_secs = {s: round(i["secs"], 2) for s, i in man.get("lineage", {}).items()}
    # lineage secs persist from the ORIGINAL run; if this invocation skipped
    # checkpointed stages, wall-clock throughput would be meaningless
    resumed = wall < 0.5 * max(sum(stage_secs.values()), 1e-9)
    print(json.dumps({
        "job": "build_index",
        "out": args.out,
        "max_doc": man["max_doc"],
        "partitions": len(man["partitions"]),
        "wall_sec": round(wall, 2),
        "resumed": resumed,
        "docs_per_sec": None if resumed else round(man["max_doc"] / max(wall, 1e-9), 1),
        "stage_secs": stage_secs,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
