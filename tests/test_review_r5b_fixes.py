"""Regression tests for the round-5 core-module review findings.

Covers: BoostedQ missing-boost-field guard, OOV multi-valued FilterQ vs
the -1 NULL-element sentinel, union carry-over of member tombstones and
stored_fields, deleted-doc masking in fetch_fields, the driver-side
``partial`` flag, field-scoped wand_topk/conjunction_topk keys+stats, and
the bounded WAND threshold buffer (rank identity on broad disjunctions).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.query.ast import (
    BoolQ,
    BoostedQ,
    Evaluator,
    FilterQ,
    FunctionQ,
    MatchAllQ,
    TermQ,
    top_k,
)


class TestBoostedQMissingField:
    def test_missing_boost_field_degrades_to_zero(self, pages_corpus):
        loc = LocalIndex(pages_corpus["index_dir"])
        child = TermQ("luko")
        cdocs, _ = Evaluator(loc).scored(child)
        assert len(cdocs)
        # previously: IndexError (fdocs[-1] on an empty numeric_values array)
        docs, scores = Evaluator(loc).scored(
            BoostedQ(child=child, func=FunctionQ("no_such_field"))
        )
        assert docs.tolist() == cdocs.tolist()
        assert scores.dtype == np.float32
        assert not scores.any()  # every doc misses the field -> product 0


def test_oov_multivalue_filter_with_null_elements(ray_session, tmp_path):
    """FilterQ(field, out-of-vocabulary) must match NOTHING, even when the
    flattened ords column contains -1 NULL-element sentinels (previously the
    OOV ord -1 matched exactly those docs)."""
    rows = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array(["alpha beta"] * 6),
            "tags": pa.array(
                [["a"], ["b", None], None, ["a", "c"], [None], ["c"]],
                type=pa.list_(pa.string()),
            ),
        }
    )
    src = str(tmp_path / "d.parquet")
    pq.write_table(rows, src)
    ix = str(tmp_path / "ix")
    build_index(
        [src], ix, rows_per_partition=4, extract_html=False, dedup_url=False,
        analyzer="simple", facet_fields=(), multi_facet_fields=("tags",),
        resume=False,
    )
    loc = LocalIndex(ix)
    docs, _ = Evaluator(loc).scored(FilterQ("tags", "zz-not-a-value"))
    assert len(docs) == 0
    # present values still match exactly
    for val, want_n in [("a", 2), ("b", 1), ("c", 2)]:
        docs, _ = Evaluator(loc).scored(FilterQ("tags", val))
        assert len(docs) == want_n, val


@pytest.fixture(scope="module")
def union_del_setup(ray_session, tmp_path_factory):
    """Two increments with stored fields; one doc tombstoned in member A
    BEFORE the union commit."""
    from lucene_solr_ray.fixtures import make_pages_batch, write_pages_parquet
    from lucene_solr_ray.index.deletes import apply_deletes
    from lucene_solr_ray.index.union import union_indexes

    root = str(tmp_path_factory.mktemp("uniondel"))
    kw = dict(rows_per_partition=64, stored_fields=("text",))
    files_a = write_pages_parquet(os.path.join(root, "pa"), 128, n_files=1)
    os.makedirs(os.path.join(root, "pb"), exist_ok=True)
    fb = os.path.join(root, "pb", "pages-00000.parquet")
    pq.write_table(make_pages_batch(np.arange(128, 256)), fb)
    ix_a = os.path.join(root, "ixa")
    ix_b = os.path.join(root, "ixb")
    ix_u = os.path.join(root, "ixu")
    build_index(files_a, ix_a, **kw)
    build_index([fb], ix_b, **kw)

    # tombstone one live doc of member A before the union commit
    la = LocalIndex(ix_a)
    victim = int(la.all_docs()[3])
    assert apply_deletes(ix_a, doc_ids=[victim]) == 1
    union_indexes([ix_a, ix_b], ix_u)
    return {"union": ix_u, "victim": victim}


class TestUnionCarryOver:
    def test_member_tombstones_visible_through_union(self, union_del_setup):
        lu = LocalIndex(union_del_setup["union"])
        victim = union_del_setup["victim"]
        assert victim in lu.stats.deleted
        assert victim not in lu.all_docs()
        docs, _ = Evaluator(lu).scored(MatchAllQ())
        assert victim not in docs

    def test_stored_fields_survive_union(self, union_del_setup):
        from lucene_solr_ray.index.searcher import SegmentSearcher

        lu = LocalIndex(union_del_setup["union"])
        assert lu.stats.stored_fields == ("text",)
        pids = [p["partition_id"] for p in lu.stats.manifest["partitions"]]
        seg = SegmentSearcher(union_del_setup["union"], pids)
        live = lu.all_docs()[:2].tolist()
        out = seg.fetch_fields(live, ["text"])
        assert set(out) == set(live)
        assert all(isinstance(v.get("text"), str) and v["text"] for v in out.values())

    def test_fetch_fields_masks_tombstoned_docs(self, union_del_setup):
        from lucene_solr_ray.index.searcher import SegmentSearcher

        lu = LocalIndex(union_del_setup["union"])
        pids = [p["partition_id"] for p in lu.stats.manifest["partitions"]]
        seg = SegmentSearcher(union_del_setup["union"], pids)
        victim = union_del_setup["victim"]
        live = int(lu.all_docs()[0])
        out = seg.fetch_fields([victim, live], ["host", "text"])
        assert victim not in out  # doc-values AND stored both masked
        assert live in out


def test_driver_search_reports_partial_flag(ray_session, pages_corpus):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        res = s.search(TermQ("luko"), k=5)
        assert res["partial"] is False  # key present; no deadline -> complete
    finally:
        s.shutdown()


@pytest.fixture(scope="module")
def titled_index(ray_session, tmp_path_factory):
    from lucene_solr_ray.fixtures import write_pages_parquet

    root = str(tmp_path_factory.mktemp("wandfield"))
    files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=2)
    ix = os.path.join(root, "ix")
    build_index(files, ix, rows_per_partition=64, extra_text_fields=("title",))
    return LocalIndex(ix)


class TestWandFieldScoped:
    def _title_terms(self, loc, n):
        terms = loc.stats.field_vocabulary("title")
        # pick mid-frequency terms so disjunctions overlap
        return terms[: n]

    def test_wand_topk_title_field_rank_identical(self, titled_index):
        from lucene_solr_ray.index.wand import wand_topk

        loc = titled_index
        terms = self._title_terms(loc, 3)
        assert terms
        got = wand_topk(loc.parts, loc.stats, terms, 10, field="title")
        assert got, "field-scoped cells must match (bare keys matched nothing)"
        ast = BoolQ(should=tuple(TermQ(t, field="title") for t in terms))
        docs, scores = Evaluator(loc).scored(ast)
        assert got == top_k(docs, scores, 10)

    def test_conjunction_topk_title_field_rank_identical(self, titled_index):
        from lucene_solr_ray.index.wand import conjunction_topk

        loc = titled_index
        # find two title terms that co-occur
        terms = loc.stats.field_vocabulary("title")
        pair = None
        for a in terms[:20]:
            da, _ = Evaluator(loc).scored(TermQ(a, field="title"))
            for b in terms[:20]:
                if a == b:
                    continue
                db, _ = Evaluator(loc).scored(TermQ(b, field="title"))
                if len(np.intersect1d(da, db)):
                    pair = [a, b]
                    break
            if pair:
                break
        assert pair, "fixture titles should share some terms"
        got, total = conjunction_topk(loc.parts, loc.stats, pair, 10, field="title")
        ast = BoolQ(must=tuple(TermQ(t, field="title") for t in pair))
        docs, scores = Evaluator(loc).scored(ast)
        assert got == top_k(docs, scores, 10)
        assert total == len(docs)


class TestWandBoundedThreshold:
    def test_broad_disjunction_small_k_rank_identical(self, pages_corpus, oracle_index):
        """k << candidate count: the running top-k buffer truncates many
        times; results must stay rank-identical to exhaustive evaluation."""
        from lucene_solr_ray.index.wand import wand_topk

        loc = LocalIndex(pages_corpus["index_dir"])
        for terms in [["luko", "kalo", "zeph", "tali"], ["luko", "kalo"], ["mado"]]:
            for k in (1, 3, 7):
                got = wand_topk(loc.parts, loc.stats, terms, k)
                want = oracle_index.search(
                    BoolQ(should=tuple(TermQ(t) for t in terms)), k
                )
                assert got == want, (terms, k)


class TestVByteFullRange:
    def test_roundtrip_beyond_2_35(self):
        """Values >= 2^35 previously overwrote their neighbor's bytes (the
        nbytes precomputation capped at 5 while the encode loop kept
        writing); the full uint64 range must round-trip."""
        from lucene_solr_ray.index.postings import (
            _vbyte_decode,
            _vbyte_encode,
            _vbyte_lengths,
        )

        vals = np.array(
            [0, 1, 127, 128, 2**34, 2**35, 7, 2**35 - 1, 2**50 + 3,
             2**63, 2**64 - 1, 42],
            dtype=np.uint64,
        )
        blob = _vbyte_encode(vals)
        assert len(blob) == int(_vbyte_lengths(vals).sum())
        got, off = _vbyte_decode(memoryview(blob), 0, len(vals))
        assert got.tolist() == vals.tolist()
        assert off == len(blob)

    def test_trailing_large_value_no_indexerror(self):
        from lucene_solr_ray.index.postings import _vbyte_decode, _vbyte_encode

        vals = np.array([3, 2**35], dtype=np.uint64)
        got, _ = _vbyte_decode(memoryview(_vbyte_encode(vals)), 0, 2)
        assert got.tolist() == [3, 2**35]


class TestSpanFieldContract:
    def test_mixed_clause_fields_raise(self):
        from lucene_solr_ray.query.spans import SpanNearQ, SpanOrQ, SpanTermQ

        with pytest.raises(ValueError, match="share one field"):
            SpanNearQ((SpanTermQ("a", field="title"), SpanTermQ("b")))
        with pytest.raises(ValueError, match="share one field"):
            SpanOrQ((SpanTermQ("a"), SpanTermQ("b", field="title")))

    def test_composite_inherits_clause_field(self):
        from lucene_solr_ray.query.spans import (
            SpanFirstQ,
            SpanNearQ,
            SpanNotQ,
            SpanOrQ,
            SpanTermQ,
        )

        near = SpanNearQ(
            (SpanTermQ("a", field="title"), SpanTermQ("b", field="title"))
        )
        assert near.field == "title"
        assert SpanOrQ((SpanTermQ("a", field="title"),)).field == "title"
        assert SpanFirstQ(SpanTermQ("a", field="title"), 5).field == "title"
        assert SpanNotQ(
            SpanTermQ("a", field="title"), SpanTermQ("b", field="title")
        ).field == "title"

    def test_explicit_non_default_mismatch_raises(self):
        from lucene_solr_ray.query.spans import SpanNearQ, SpanTermQ

        with pytest.raises(ValueError, match="!= clause field"):
            SpanNearQ((SpanTermQ("a", field="title"),), field="host")

    def test_title_span_scored_with_title_stats(self, titled_index):
        """A span tree over a non-text field must score with THAT field's
        idf/norms (previously the composite defaulted to 'text')."""
        from lucene_solr_ray.query.ast import PhraseQ
        from lucene_solr_ray.query.spans import SpanNearQ, SpanTermQ

        import re

        from lucene_solr_ray.analysis.html_extract import extract
        from lucene_solr_ray.fixtures import make_pages_batch

        loc = titled_index
        # probe consecutive token pairs from real fixture titles until one
        # matches as an exact title phrase (stop-filtered/OOV pairs skip)
        pair = None
        for html in make_pages_batch(np.arange(20))["html"].to_pylist():
            toks = re.findall(r"[a-z0-9]+", extract(html)[0].lower())
            for a, b in zip(toks, toks[1:]):
                if a == b:
                    continue
                docs, _ = Evaluator(loc).scored(PhraseQ((a, b), field="title"))
                if len(docs):
                    pair = (a, b)
                    break
            if pair:
                break
        assert pair, "fixture titles should contain some adjacent bigram"
        span = SpanNearQ(
            (SpanTermQ(pair[0], field="title"), SpanTermQ(pair[1], field="title")),
            slop=0,
            in_order=True,
        )
        assert span.field == "title"
        sdocs, sscores = Evaluator(loc).scored(span)
        pdocs, _ = Evaluator(loc).scored(PhraseQ(pair, field="title"))
        assert sdocs.tolist() == pdocs.tolist()
        # scores must come from TITLE-field stats: recompute them with the
        # title idf/norms/avgdl and require bit-identity; text-field stats
        # must NOT reproduce them (the pre-fix behavior)
        from lucene_solr_ray.index import bm25
        from lucene_solr_ray.query.spans import extract_terms, span_freqs
        from lucene_solr_ray.stages.tokenize import field_term_key

        _, freqs = span_freqs(loc, span)

        def expected(field):
            n, sdl = loc.global_stats(field)
            avgdl = bm25.avg_dl(sdl, n)
            acc = np.float32(0.0)
            for t in extract_terms(span):
                acc = np.float32(
                    acc + bm25.idf(loc.stats.df.get(field_term_key(field, t), 0), n)
                )
            wv = np.float32(np.float32(acc * np.float32(1.0)) * np.float32(bm25.K1 + np.float32(1.0)))
            nb = loc.norm_bytes(field, sdocs)
            return bm25.term_scores(freqs, nb, bm25.norm_cache(avgdl), wv)

        assert sscores.tolist() == expected("title").tolist()
        assert sscores.tolist() != expected("text").tolist()


def test_stats_full_nchars_degenerate_corpus(ray_session, tmp_path):
    from lucene_solr_ray.pipelines.fulltext import stats_full_nchars

    for rows in ([], [100]):
        d = tmp_path / f"sf_{len(rows)}"
        d.mkdir()
        pq.write_table(
            pa.table({"n_chars": pa.array(rows, type=pa.int64())}),
            str(d / "documents.parquet"),
        )
        out = stats_full_nchars(str(d))  # previously ZeroDivisionError
        assert out["cnt"][0].as_py() == len(rows)
        assert out["stddev_c"][0].as_py() == 0.0


def test_long_chain_components_converge_large_regime(ray_session):
    """A diameter-40 chain must collapse to ONE component in the bucketed
    (large) regime — the old fixed 16-round one-hop loop silently returned
    a fragmented labeling; rounds are now pointer-jumped AND convergence-
    checked."""
    import ray.data as rd

    from lucene_solr_ray.stages.dedup import pair_graph_clusters

    n = 41
    pairs = [{"a": i, "b": i + 1} for i in range(n - 1)]
    ids_ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), type=pa.int64())}))
    out = pair_graph_clusters(
        rd.from_items(pairs), ids_ds, small_rows=0, shuffle_buckets=4
    )
    rows = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert len(rows) == n
    assert set(rows.values()) == {0}


def test_langid_tie_returns_und():
    """Equal non-zero scores across languages must classify as 'und', not
    the alphabetically-first language (an arbitrary pick)."""
    from lucene_solr_ray.stages.textstats import LanguageId

    lid = LanguageId()
    # tokens unique to EXACTLY one profile each; a doc with one of each
    # scores 1:1 between those two languages, 0 elsewhere -> tie
    def only_in(lang):
        others = set().union(
            *(set(p) for L, p in lid.profiles.items() if L != lang)
        )
        return sorted(set(lid.profiles[lang]) - others)

    langs = sorted(L for L in lid.profiles if only_in(L))
    assert len(langs) >= 2, "fixture profiles too overlapping for this test"
    a, b = langs[0], langs[1]
    ta, tb = only_in(a)[0], only_in(b)[0]
    assert lid.classify(f"{ta} {tb}") == "und"
    assert lid.classify("") == "und"
    # non-tie sanity: two distinct a-only tokens beat one b token
    if len(only_in(a)) >= 2:
        ta2 = only_in(a)[1]
        assert lid.classify(f"{ta} {ta2} {tb}") == a


def test_brute_dup_pairs_empty_input(ray_session):
    """Zero-row input returns an empty (vec_a, vec_b) table, not a numpy
    concatenate crash."""
    import ray.data as rd

    from lucene_solr_ray.stages.ann import brute_dup_pairs

    empty = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    })
    out = brute_dup_pairs(rd.from_arrow(empty), threshold=0.9, id_col="vec_id")
    assert out.num_rows == 0
    assert out.column_names == ["vec_a", "vec_b"]


def test_exact_dedup_bucketed_min_id(ray_session):
    """exact_dedup groups by a coarse bucket (bounded task count), so one
    group mixes many content hashes; min-id per DISTINCT text must still be
    globally exact, even at shuffle_buckets=1 (everything in one group)."""
    import ray.data as rd

    from lucene_solr_ray.stages.dedup import exact_dedup

    texts = ["alpha", "beta", "gamma", "alpha", "beta", "alpha"]
    ids = [10, 11, 12, 3, 7, 5]
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts)})
    for buckets in (1, 64):
        out = exact_dedup(
            rd.from_arrow(tbl), shuffle_buckets=buckets
        ).to_pandas().sort_values("doc_id")
        assert sorted(out["doc_id"].tolist()) == [3, 7, 12]
        assert set(out.columns) == {"doc_id", "text", "content_hash"}
