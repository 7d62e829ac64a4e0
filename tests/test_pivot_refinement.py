"""Distributed two-level pivot facets with over-request + refinement
(`PivotFacetProcessor.java` / `PivotFacet.java` analog): the refined
distributed tree must equal the exact path and a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.query.ast import BoolQ, MatchAllQ, TermQ


def _pandas_pivot(rows, hit_ids, f1, f2, limit=100, sub_limit=100, mincount=1):
    df = pd.DataFrame(rows)
    df = df[df["doc_id"].isin(hit_ids)]
    out = []
    pc = df[df[f1].notna()][f1].value_counts()
    # (count desc, value asc) — dictionary ordinals are sorted values
    parents = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    for pv, pn in parents:
        if pn < mincount:
            continue
        sub = df[(df[f1] == pv) & df[f2].notna()][f2].value_counts()
        children = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:sub_limit]
        out.append((pv, int(pn), [(cv, int(cn)) for cv, cn in children if cn >= mincount]))
    return out


@pytest.mark.parametrize("overrequest", [False, True])
def test_pivot_matches_pandas_oracle(ray_session, pages_corpus, oracle_rows,
                                     oracle_index, overrequest):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=3)
    try:
        for ast in [MatchAllQ(), TermQ("luko"),
                    BoolQ(should=(TermQ("kalo"), TermQ("zeph")))]:
            hits = {d for _, d in oracle_index.search(ast, 10**9)}
            expect = _pandas_pivot(oracle_rows, hits, "lang", "tld")
            got = s.pivot_facets(ast, ("lang", "tld"), limit=100, sub_limit=100,
                                 mincount=1, overrequest=overrequest)
            assert got == expect, ast
    finally:
        s.shutdown()


def test_pivot_refined_equals_exact_small_limit(ray_session, pages_corpus):
    """Over-request truncation plus refinement must reproduce the exact
    path's tree at tight limits (the refineFacets differential)."""
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=3)
    try:
        for ast in [MatchAllQ(), TermQ("luko")]:
            exact = s.pivot_facets(ast, ("lang", "tld"), limit=3, sub_limit=4)
            refined = s.pivot_facets(ast, ("lang", "tld"), limit=3, sub_limit=4,
                                     overrequest=True)
            assert refined == exact, ast
    finally:
        s.shutdown()


def test_pivot_parent_counts_include_missing_child(ray_session, tmp_path):
    """A parent bucket counts docs that LACK the child field value; the
    child list covers only docs with both (each pivot level is an
    independent facet over the constrained docset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    rows = pa.table(
        {
            "doc_id": pa.array(list(range(6)), type=pa.int64()),
            "lang": pa.array(["en", "en", "en", "de", "de", None]),
            "source": pa.array(["web", "web", None, "web", "mail", "mail"]),
            "text": pa.array(["alpha beta"] * 6),
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(rows, src)
    ix = str(tmp_path / "ix")
    build_index([src], ix, rows_per_partition=2, extract_html=False,
                dedup_url=False, analyzer="simple",
                facet_fields=("lang", "source"), resume=False)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        for overreq in (False, True):
            got = s.pivot_facets(TermQ("alpha"), ("lang", "source"),
                                 overrequest=overreq)
            assert got == [
                ("en", 3, [("web", 2)]),
                ("de", 2, [("mail", 1), ("web", 1)]),
            ], overreq
    finally:
        s.shutdown()
