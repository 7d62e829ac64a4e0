"""Query job entry point for ``ray job submit``.

    ray job submit --working-dir . -- \\
        python jobs/query_job.py --index /data/index --q "luko AND kalo" \\
            --k 10 --facet host --actors 8

Parses the query with the classic parser, executes it through the
segment-actor pool, and prints the results as a Solr-style JSON response
(``sources/writers.to_json_response``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--q", required=True, help="classic query syntax")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--facet", action="append", default=[], help="facet field (repeatable)")
    ap.add_argument("--facet-limit", type=int, default=10)
    ap.add_argument("--actors", type=int, default=4)
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--wt", default="json", choices=["json", "xml", "csv"])
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     ignore_reinit_error=True)
        except ConnectionError:
            ray.init(address="local", ignore_reinit_error=True)

    import pyarrow as pa

    from lucene_solr_ray.index.searcher import RayIndexSearcher
    from lucene_solr_ray.query.parser import QueryParser
    from lucene_solr_ray.sources import writers

    ast = QueryParser(analyzer=args.analyzer).parse(args.q)
    s = RayIndexSearcher(args.index, num_actors=args.actors)
    try:
        t0 = time.time()
        res = s.search(ast, k=args.k, facet_fields=tuple(args.facet),
                       facet_limit=args.facet_limit, facet_mincount=1)
        if res["total_hits"] < 0:
            # WAND fast path reports 'unknown' (-1); a deadline-bearing call
            # routes through the exhaustive loop, giving the exact count
            res = s.search(ast, k=args.k, facet_fields=tuple(args.facet),
                           facet_limit=args.facet_limit, facet_mincount=1,
                           time_allowed_ms=10**9)
        qtime = int((time.time() - t0) * 1000)
        tbl = pa.table(
            {
                "doc_id": pa.array([d for _, d in res["topk"]], type=pa.int64()),
                "score": pa.array([sc for sc, _ in res["topk"]], type=pa.float64()),
            }
        )
        fn = {"json": writers.to_json_response, "xml": writers.to_xml_response,
              "csv": writers.to_csv_response}[args.wt]
        kwargs = {} if args.wt == "csv" else {
            "num_found": res["total_hits"], "qtime_ms": qtime,
            "facets": res["facets"] or None,
        }
        # one document on stdout (facets embedded; csv has no facet block)
        print(fn(tbl, **kwargs))
    finally:
        s.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
