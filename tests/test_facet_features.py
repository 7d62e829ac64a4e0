"""Facet offset/prefix, heuristic sampling, hash join."""

import pytest

from lucene_solr_ray.query.ast import MatchAllQ, TermQ


def test_facet_offset_and_prefix(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        res = s.search(
            MatchAllQ(), facet_fields=("host",),
            facet_limit=5, facet_offset=3, facet_mincount=1, facet_prefix="site00",
        )
        o_hits = [d for _, d in oracle_index.search(MatchAllQ(), 10**9)]
        want = oracle_index.facet(o_hits, "host", limit=5, offset=3, mincount=1, prefix="site00")
        assert res["facets"]["host"] == want
    finally:
        s.shutdown()


def test_facet_index_sort_with_mincount_zero(ray_session, pages_corpus, oracle_index):
    """facet.sort=index + mincount=0: zero-count entries interleave in
    dictionary order (regression: they were appended after positives)."""
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        # pick a genuinely rare term (df<=2) so zero-count hosts must appear
        from lucene_solr_ray.stages.tokenize import FIELD_SEP

        rare = next(
            t for t, pl in sorted(oracle_index._post.items())
            if FIELD_SEP not in t and len(pl) <= 2
        )
        q = TermQ(rare)
        vocab = s.stats.dicts["host"]
        lim = min(len(vocab), 30)
        res = s.search(q, facet_fields=("host",), facet_limit=lim,
                       facet_mincount=0, facet_sort="index")
        o_hits = [d for _, d in oracle_index.search(q, 10**9)]
        # independent expectation: first `lim` dictionary values with exact
        # counts over the hit set (0 when absent)
        from collections import Counter

        host_of = {r["doc_id"]: r["host"] for r in oracle_index.rows}
        counts = Counter(host_of[d] for d in o_hits)
        want = [(vocab[o], counts.get(vocab[o], 0)) for o in range(lim)]
        assert res["facets"]["host"] == want
        # sanity: at least one zero-count entry is interleaved
        assert any(c == 0 for _, c in want)
    finally:
        s.shutdown()


def test_facet_heuristic_full_stride_equals_exact(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        q = TermQ("luko")
        # tld has 8 values < the over-request limit -> no per-actor candidate
        # truncation, so stride=1 + fine-count is EXACT end to end
        exact_tld = s.search(q, facet_fields=("tld",), facet_limit=10, facet_mincount=1)["facets"]["tld"]
        heur_tld = s.facet_heuristic(q, "tld", limit=10, stride=1, fine_count=True)
        assert heur_tld == [vc for vc in exact_tld if vc[1] > 0]
        # high-cardinality field: candidate selection is approximate (per-actor
        # over-request truncation, same as the reference), counts stay exact
        exact = s.search(q, facet_fields=("host",), facet_limit=10, facet_mincount=1)["facets"]["host"]
        # stride=2 with fine-count: candidate SELECTION is approximate but the
        # returned counts must be exact for every value also in the exact list
        heur2 = dict(s.facet_heuristic(q, "host", limit=10, stride=2, fine_count=True))
        exact_map = dict(exact)
        overlap = [v for v in heur2 if v in exact_map]
        assert overlap, "sampled facet should find at least one true top value"
        for v in overlap:
            assert heur2[v] == exact_map[v]
    finally:
        s.shutdown()


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from lucene_solr_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 3, 5], "a": list("abcde")})
    right = pd.DataFrame({"j": [2, 3, 3, 4], "b": list("wxyz")})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "j", buckets=4)
        .to_pandas()[["k", "a", "b"]]
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="j")[["k", "a", "b"]]
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_facet_missing_bucket(ray_session, tmp_path):
    """facet.missing: docs with a null facet value count into the None
    bucket; present values are unaffected."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    rows = pa.table(
        {
            "doc_id": pa.array(range(8), type=pa.int64()),
            "text": pa.array(["alpha beta"] * 8),
            "lang": pa.array(["en", "en", None, "de", None, "de", "en", None]),
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(rows, src)
    ix = str(tmp_path / "ix")
    build_index([src], ix, rows_per_partition=4, extract_html=False,
                dedup_url=False, analyzer="simple", facet_fields=("lang",),
                resume=False)
    from lucene_solr_ray.query.ast import MatchAllQ

    s = RayIndexSearcher(ix, num_actors=2)
    try:
        res = s.search(MatchAllQ(), k=1, facet_fields=("lang",),
                       facet_limit=10, facet_mincount=1, facet_missing=True)
        assert res["facets"]["lang"] == [("en", 3), ("de", 2), (None, 3)]
        # without the flag the bucket is absent
        res2 = s.search(MatchAllQ(), k=1, facet_fields=("lang",),
                        facet_limit=10, facet_mincount=1)
        assert res2["facets"]["lang"] == [("en", 3), ("de", 2)]
    finally:
        s.shutdown()


def test_hash_join_preserves_right_key_dtype(ray_session):
    """Differing key dtypes (int32 vs int64) promote only inside the skinny
    Acero join; the OUTPUT right-key column keeps the right table's own
    dtype and nulls out on unmatched left rows (left-outer contract)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lucene_solr_ray.stages.joins import hash_join

    left = rd.from_arrow(pa.table(
        {"lk": pa.array([1, 2, 3, 4], pa.int64()), "lv": list("abcd")}))
    right = rd.from_arrow(pa.table(
        {"rk": pa.array([2, 3, 5], pa.int32()), "rv": [20.0, 30.0, 50.0]}))
    tabs = [ray.get(r) for r in
            hash_join(left, right, "lk", "rk", how="left").to_arrow_refs()]
    t = pa.concat_tables([x for x in tabs if x.num_rows]).sort_by("lk")
    assert t.schema.field("rk").type == pa.int32()
    assert t["rk"].to_pylist() == [None, 2, 3, None]
    assert t["rv"].to_pylist() == [None, 20.0, 30.0, None]


def test_concat_or_empty_zero_batches():
    """A zero-batch dataset must yield an empty table of the expected
    schema, not an ArrowInvalid from pa.concat_tables([])."""
    import pyarrow as pa

    from lucene_solr_ray.pipelines.fulltext import _concat_or_empty

    schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    out = _concat_or_empty(iter([]), schema)
    assert out.num_rows == 0 and out.schema == schema
    one = pa.table({"term": ["a"], "df": pa.array([1], pa.int64())})
    assert _concat_or_empty(iter([one]), schema).num_rows == 1
