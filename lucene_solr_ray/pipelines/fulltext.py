"""Index-backed pipelines over the ``documents`` table (driver contract).

Each function takes ``sf_dir`` and returns a ``pyarrow.Table``; the matching
DuckDB oracle SQL lives in ``__ray_entry__.oracle_sql``.  SQL-checked entries
use the "simple" analyzer (lowercase + ``[a-z0-9]+`` — bit-identical to the
DuckDB regexp used in the oracle), so the *distributed index build machinery*
(explode → (term, partition) shuffle → encode → global stats) is what the
correctness gate actually exercises.  BM25 entries use the full
StandardAnalyzer-equivalent chain and are verified rank-identical against the
pure-Python oracle in pytest instead (non-SQL-expressible: float32 BM25 with
byte315 norm quantization).

Index builds are cached under /tmp keyed by (input file stats, analyzer);
``resume=True`` makes repeat calls skip all stages.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..index.build import build_index
from ..index.reader import LocalIndex
from ..index.searcher import RayIndexSearcher
from ..query.ast import BoolQ, Evaluator, PhraseQ, TermQ, top_k

CACHE_ROOT = os.environ.get("LSR_CACHE", "/tmp/lsr_index_cache")

# fixed query terms drawn from the documents vocabulary (TESTDATA corpus)
SEARCH_TERMS = ["join", "hash", "window", "vector", "stream", "customer", "merge"]


def documents_index(sf_dir: str, analyzer: str = "simple", variant: str = "") -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_size}:{st.st_mtime_ns}:{analyzer}:{variant}:v3".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, key)
    build_index(
        [src],
        index_dir,
        rows_per_partition=128,
        extract_html=False,
        dedup_url=False,
        analyzer=analyzer,
        facet_fields=("lang", "source"),
        numeric_fields=("n_chars",),
        resume=True,
    )
    return index_dir


def incremental_union_term_df(sf_dir: str) -> pa.Table:
    """Incremental ingest under the SQL gate: documents split into two
    increments (doc_id < 250 / >= 250), each built as its own immutable
    index, committed via ``union_indexes`` — the union's global term stats
    must equal a single-index build (same oracle as ``term_df_top100``)."""
    import pyarrow.parquet as pqf

    from ..index.union import union_indexes

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(f"{src}:{st.st_size}:{st.st_mtime_ns}:unionv1".encode()).hexdigest()[:16]
    root = os.path.join(CACHE_ROOT, "union_" + key)
    union_dir = os.path.join(root, "union")
    if not os.path.exists(os.path.join(union_dir, "manifest.json")):
        os.makedirs(root, exist_ok=True)
        tbl = pqf.read_table(src)
        # split on a partition boundary (rows_per_partition=128 -> doc 256)
        cut = 256
        pqf.write_table(tbl.filter(pc.less(tbl["doc_id"], cut)), os.path.join(root, "a.parquet"))
        pqf.write_table(tbl.filter(pc.greater_equal(tbl["doc_id"], cut)), os.path.join(root, "b.parquet"))
        kw = dict(
            rows_per_partition=128, extract_html=False, dedup_url=False,
            analyzer="simple", facet_fields=("lang", "source"),
            numeric_fields=("n_chars",), resume=True,
        )
        build_index([os.path.join(root, "a.parquet")], os.path.join(root, "ixa"), **kw)
        build_index([os.path.join(root, "b.parquet")], os.path.join(root, "ixb"), **kw)
        union_indexes([os.path.join(root, "ixa"), os.path.join(root, "ixb")], union_dir)
    t = _terms_topn(union_dir, "df", 100)
    return _rank_table({"term": t["term"].to_pylist(),
                        "df": pc.cast(t["df"], pa.int64()).to_pylist()})


def _rank_table(cols: dict) -> pa.Table:
    n = len(next(iter(cols.values())))
    return pa.table({"rank": pa.array(range(n), type=pa.int64()), **{
        k: pa.array(v) for k, v in cols.items()
    }})


def _concat_or_empty(batches, schema: pa.Schema) -> pa.Table:
    """``pa.concat_tables`` over an iterator of batches, tolerating a
    ZERO-batch dataset (``concat_tables([])`` raises ArrowInvalid): an empty
    corpus falls back to an empty table of the expected schema instead."""
    tables = list(batches)
    return pa.concat_tables(tables) if tables else schema.empty_table()


# ---- term statistics (exercises the groupby-term shuffle) -------------------


def _terms_topn(index_dir: str, key: str, n: int):
    """Distributed top-N of the term dictionary by (key desc, term asc):
    per-block partial top-N inside ``map_batches`` (the global top-N is a
    subset of the union of block top-Ns), then a tiny <= N*blocks driver
    merge — the dictionary itself never reaches the driver."""
    def block_top(t: pa.Table) -> pa.Table:
        # zero-copy Arrow sort (no pandas materialization per block)
        idx = pc.sort_indices(
            t, sort_keys=[(key, "descending"), ("term", "ascending")]
        )
        return t.take(idx[:n])

    parts = _concat_or_empty(
        rd.read_parquet(os.path.join(index_dir, "terms_global"), columns=["term", key])
        .map_batches(block_top, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"),  # <= n * n_blocks rows total
        pa.schema([("term", pa.string()), (key, pa.int64())]),
    )
    idx = pc.sort_indices(
        parts, sort_keys=[(key, "descending"), ("term", "ascending")]
    )
    return parts.take(idx[:n])


def term_df_top100(sf_dir: str) -> pa.Table:
    """Top 100 terms by document frequency (df desc, term asc)."""
    ix = documents_index(sf_dir)
    t = _terms_topn(ix, "df", 100)
    return _rank_table({"term": t["term"].to_pylist(),
                        "df": pc.cast(t["df"], pa.int64()).to_pylist()})


def term_ttf_top100(sf_dir: str) -> pa.Table:
    """Top 100 terms by total term frequency (ttf desc, term asc)."""
    ix = documents_index(sf_dir)
    t = _terms_topn(ix, "ttf", 100)
    return _rank_table({"term": t["term"].to_pylist(),
                        "ttf": pc.cast(t["ttf"], pa.int64()).to_pylist()})


def terms_component_prefix(sf_dir: str) -> pa.Table:
    """TermsComponent analog: prefix scan in index order, df per term.

    The sharded dictionary makes this a RANGE read: only the shards whose
    [first, next-first) range intersects the prefix are opened (BlockTree
    prefix seek); the scan itself is a lazy iter_range."""
    from ..index.reader import GlobalStats

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    lo, hi = stats.terms.prefix_range("c")
    terms = []
    from ..stages.tokenize import FIELD_SEP

    for t in stats.terms.iter_range(lo, hi):
        if FIELD_SEP in t:
            # other fields' "field\x1fterm" keys interleave the default
            # field's range (same skip as GlobalStats.prefix_terms)
            continue
        terms.append(t)
        if len(terms) >= 50:
            break
    return pa.table({
        "term": terms,
        "df": pa.array([stats.df.get(t, 0) for t in terms], type=pa.int64()),
    })


# ---- boolean / phrase search (doc-set semantics, SQL-checkable) -------------


def _search_docs(sf_dir: str, query) -> pa.Table:
    ix = documents_index(sf_dir)
    docs, _ = Evaluator(LocalIndex(ix)).scored(query)
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def search_and(sf_dir: str) -> pa.Table:
    return _search_docs(sf_dir, BoolQ(must=(TermQ("join"), TermQ("vector"))))


def search_or(sf_dir: str) -> pa.Table:
    return _search_docs(sf_dir, BoolQ(should=(TermQ("window"), TermQ("stream"))))


def search_must_not(sf_dir: str) -> pa.Table:
    return _search_docs(sf_dir, BoolQ(must=(TermQ("join"),), must_not=(TermQ("hash"),)))


def search_phrase(sf_dir: str) -> pa.Table:
    return _search_docs(sf_dir, PhraseQ(("join", "hash")))


def search_phrase_slop(sf_dir: str) -> pa.Table:
    """Sloppy phrase "join hash"~2 hit set (exact SloppyPhraseScorer
    semantics, `search/SloppyPhraseScorer.java:100-134`).  For two distinct
    terms the match contract reduces to: exists an occurrence pair with
    |pos(hash) - pos(join) - 1| <= slop — which the SQL oracle states
    positionally over the simple tokenization."""
    return _search_docs(sf_dir, PhraseQ(("join", "hash"), slop=2))


def search_msm(sf_dir: str) -> pa.Table:
    """minimumShouldMatch=2 of three optional terms."""
    return _search_docs(
        sf_dir,
        BoolQ(should=(TermQ("join"), TermQ("vector"), TermQ("stream")), minimum_should_match=2),
    )


def search_span_near_ordered(sf_dir: str) -> pa.Table:
    """SpanNearQuery(in_order=True, slop=3): 'join' then 'hash' with at most
    3 intervening tokens (`spans/SpanNearQuery.java` / NearSpansOrdered)."""
    from ..query.spans import SpanNearQ, SpanTermQ

    return _search_docs(
        sf_dir, SpanNearQ((SpanTermQ("join"), SpanTermQ("hash")), slop=3, in_order=True)
    )


def search_span_near_unordered(sf_dir: str) -> pa.Table:
    """SpanNearQuery(in_order=False, slop=2): 'join' and 'vector' within a
    2-token gap in either order (NearSpansUnordered)."""
    from ..query.spans import SpanNearQ, SpanTermQ

    return _search_docs(
        sf_dir, SpanNearQ((SpanTermQ("join"), SpanTermQ("vector")), slop=2, in_order=False)
    )


def search_span_first(sf_dir: str) -> pa.Table:
    """SpanFirstQuery: 'join' within the first 20 token positions."""
    from ..query.spans import SpanFirstQ, SpanTermQ

    return _search_docs(sf_dir, SpanFirstQ(SpanTermQ("join"), 20))


def parsed_query_search(sf_dir: str) -> pa.Table:
    """End-to-end through the classic query parser: parse a query string,
    evaluate against the index — the parser itself sits inside the SQL gate."""
    from ..query.parser import QueryParser

    ast = QueryParser().parse("join AND vector -hash")
    return _search_docs(sf_dir, ast)


def surround_search_docs(sf_dir: str) -> pa.Table:
    """End-to-end through the surround query parser
    (`lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/`):
    ``3W(customer, join) OR (stream N window)`` — prefix ordered-distance op
    (slop 2), infix unordered adjacency (slop 0), boolean OR over the two
    span subtrees.  Constant doc-set contract; the SQL oracle replays both
    positional relations over the simple tokenization."""
    from ..query.surround import SurroundParser

    ast = SurroundParser().parse("3W(customer, join) OR (stream N window)")
    return _search_docs(sf_dir, ast)


def search_prefix_docs(sf_dir: str) -> pa.Table:
    """PrefixQuery 'cust*' hit set (`search/PrefixQuery.java`, constant-score
    rewrite): expansion is a sorted-dictionary RANGE scan (BlockTree prefix
    seek analog) — the entry S-gates the prefix_terms shard-pruned path."""
    from ..query.ast import MultiTermQ

    # 's' expands to several terms (scan/slow/small/sort/spark/stream in the
    # fixture vocabulary) so the union-of-postings path is exercised
    return _search_docs(sf_dir, MultiTermQ("prefix", "s"))


def search_wildcard_docs(sf_dir: str) -> pa.Table:
    """WildcardQuery 's?a*' hit set (`search/WildcardQuery.java`): literal-
    prefix-bounded dictionary scan, then full-pattern match in the slice
    (multi-term expansion: scan/small/spark in the fixture vocabulary)."""
    from ..query.ast import MultiTermQ

    return _search_docs(sf_dir, MultiTermQ("wildcard", "s?a*"))


def search_fuzzy_docs(sf_dir: str) -> pa.Table:
    """FuzzyQuery 'slot'~2 hit set (`search/FuzzyQuery.java`): expansion via
    the DP-guided seek over the sorted dictionary (the LevenshteinAutomata ∩
    BlockTree intersect analog, round-3) — multi-term expansion (slow + sort
    in the fixture vocabulary), S-gated against DuckDB ``levenshtein`` over
    the distinct token vocabulary."""
    from ..query.ast import MultiTermQ

    return _search_docs(sf_dir, MultiTermQ("fuzzy", "slot", arg2=2))


def search_term_range_docs(sf_dir: str) -> pa.Table:
    """TermRangeQuery text:[order TO scan] hit set
    (`search/TermRangeQuery.java`): expansion is a two-seek sorted-dictionary
    range scan (order/part/query/row/scan in the fixture vocabulary),
    constant-score union of the matched postings."""
    from ..query.ast import TermRangeQ

    return _search_docs(sf_dir, TermRangeQ(lo="order", hi="scan"))


def search_numeric_range_docs(sf_dir: str) -> pa.Table:
    """NumericRangeQuery n_chars:[200 TO 400] hit set
    (`search/NumericRangeQuery.java` / Solr TrieField ranges): evaluated on
    the numeric doc-values column (we always materialize doc values at build,
    so no Trie precision-step terms are needed)."""
    from ..query.ast import RangeQ

    return _search_docs(sf_dir, RangeQ("n_chars", 200, 400))


def frange_docs(sf_dir: str) -> pa.Table:
    """{!frange l=2.5 u=2.8}log(n_chars) hit set (FunctionRangeQParserPlugin /
    `ValueSourceRangeFilter.java`): bounds compared in float32 exactly as the
    reference's floatVal path — the oracle casts log10 to FLOAT before
    comparing."""
    from ..query.ast import FRangeQ, FunctionQ

    return _search_docs(sf_dir, FRangeQ(FunctionQ("n_chars", fn="log"), lo=2.5, hi=2.8))


def dismax_topk_simple(sf_dir: str) -> pa.Table:
    """DisjunctionMaxQuery (tiebreak=0.3) top-10 under the SQL gate: score =
    max(clause scores) + 0.3 * (sum - max), float32 at every step
    (`DisjunctionMaxScorer.java` ``scoreMax + (scoreSum - scoreMax) * tie``)
    — the oracle replays the same f32 rounding points in SQL."""
    ix = documents_index(sf_dir)
    from ..query.ast import DisMaxQ

    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    out = {"qid": [], "rank": [], "doc_id": []}
    pairs = [("join", "hash"), ("window", "stream")]
    for qid, (a, b) in enumerate(pairs):
        docs, scores = ev.scored(DisMaxQ((TermQ(a), TermQ(b)), tiebreak=0.3))
        for rank, (_score, doc) in enumerate(top_k(docs, scores, 10)):
            out["qid"].append(qid)
            out["rank"].append(rank)
            out["doc_id"].append(doc)
    return pa.table(
        {
            "qid": pa.array(out["qid"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
    )


def dismax3_topk_simple(sf_dir: str) -> pa.Table:
    """Three-clause DisjunctionMaxQuery (tiebreak=0.3) top-10 — the wider
    disjunction the 2-clause oracle's double-sum shortcut could NOT replay
    (ADVICE r3): ``DisjunctionMaxScorer`` folds scoreSum clause-by-clause in
    float32, so the oracle mirrors the fold recursively (f32 round per add,
    clause order, missing clauses contribute nothing)."""
    ix = documents_index(sf_dir)
    from ..query.ast import DisMaxQ

    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    out = {"qid": [], "rank": [], "doc_id": []}
    triples = [("join", "hash", "window"), ("stream", "vector", "customer")]
    for qid, (a, b, c) in enumerate(triples):
        docs, scores = ev.scored(DisMaxQ((TermQ(a), TermQ(b), TermQ(c)), tiebreak=0.3))
        for rank, (_score, doc) in enumerate(top_k(docs, scores, 10)):
            out["qid"].append(qid)
            out["rank"].append(rank)
            out["doc_id"].append(doc)
    return pa.table(
        {
            "qid": pa.array(out["qid"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
    )


# ---- BM25 ranking (oracle: pytest vs pure-Python; driver: rows-only) --------


def bm25_topk(sf_dir: str) -> pa.Table:
    """Distributed BM25 top-10 for a fixed query set (StandardAnalyzer chain,
    float32 scores, (score desc, doc_id asc) order)."""
    ix = documents_index(sf_dir, analyzer="standard")
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        qids, ranks, dids, scores = [], [], [], []
        for qid, term in enumerate(SEARCH_TERMS):
            res = s.search(TermQ(term), k=10)
            for rank, (score, doc) in enumerate(res["topk"]):
                qids.append(qid)
                ranks.append(rank)
                dids.append(doc)
                scores.append(float(score))
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(dids, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )
    finally:
        s.shutdown()


def bm25_topk_simple(sf_dir: str) -> pa.Table:
    """BM25 top-10 per query term over the simple-analyzer index, THROUGH the
    distributed actor pool (WAND path) — S-gated: the DuckDB oracle recomputes
    the full float32 BM25 (idf, byte315 norm quantization, float32 op order)
    natively in SQL and must produce identical (qid, rank, doc_id) triples."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        qids, ranks, dids = [], [], []
        for qid, term in enumerate(SEARCH_TERMS):
            res = s.search(TermQ(term), k=10)
            for rank, (_score, doc) in enumerate(res["topk"]):
                qids.append(qid)
                ranks.append(rank)
                dids.append(doc)
        return pa.table(
            {
                "qid": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(dids, type=pa.int64()),
            }
        )
    finally:
        s.shutdown()


def bm25_and_topk_simple(sf_dir: str) -> pa.Table:
    """Conjunctive BM25 (float32 sum of per-term scores) top-10 for 3 term
    pairs — S-gated like :func:`bm25_topk_simple`."""
    ix = documents_index(sf_dir)
    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    out = {"qid": [], "rank": [], "doc_id": []}
    pairs = [("join", "hash"), ("window", "stream"), ("vector", "customer")]
    for qid, (a, b) in enumerate(pairs):
        docs, scores = ev.scored(BoolQ(must=(TermQ(a), TermQ(b))))
        for rank, (_score, doc) in enumerate(top_k(docs, scores, 10)):
            out["qid"].append(qid)
            out["rank"].append(rank)
            out["doc_id"].append(doc)
    return pa.table(
        {
            "qid": pa.array(out["qid"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
    )


def tfidf_topk_simple(sf_dir: str) -> pa.Table:
    """ClassicSimilarity (TF-IDF) top-10 per query — S-gated rank-identity.

    The reference line (Solr 4.10) defaults to the vector-space TF-IDF
    similarity, not BM25 (``DefaultSimilarity`` /
    ``TFIDFSimilarity.java:773-782``): ``score = tf(freq) * value *
    decodeNorm(b)`` with ``tf = (float)sqrt(freq)``, ``idf =
    (float)(ln(N/(df+1))+1)``, a global queryNorm over the f32 sum of
    squared clause weights, and byte315 norm DECODE (not BM25's 1/f²
    table).  The DuckDB oracle replays every float32 rounding point; the
    disjunction accumulates per-term doc scores in double and casts f32
    (DisjunctionSumScorer semantics)."""
    from ..index import tfidf

    ix = documents_index(sf_dir)
    loc = LocalIndex(ix)
    n, _ = loc.global_stats("text")
    queries = [("join",), ("window", "stream"), ("vector", "customer")]
    out = {"qid": [], "rank": [], "doc_id": []}
    for qid, terms in enumerate(queries):
        idfs = [tfidf.idf(loc.global_df("text", t), n) for t in terms]
        qn = tfidf.query_norm(tfidf.sum_sq_weights(idfs))
        all_docs: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for t, idf_v in zip(terms, idfs):
            docs, tfs = loc.postings("text", t)
            if len(docs) == 0:
                continue
            nb = loc.norm_bytes("text", docs)
            all_docs.append(docs)
            all_scores.append(
                tfidf.term_scores(tfs, nb, tfidf.term_value(idf_v, qn))
            )
        if not all_docs:
            continue
        d = np.concatenate(all_docs)
        sc = np.concatenate(all_scores).astype(np.float64)
        uniq, inv = np.unique(d, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, sc)
        for rank, (_score, doc) in enumerate(
            top_k(uniq, acc.astype(np.float32), 10)
        ):
            out["qid"].append(qid)
            out["rank"].append(rank)
            out["doc_id"].append(doc)
    return pa.table(
        {
            "qid": pa.array(out["qid"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
    )


def collapse_lang_docs(sf_dir: str) -> pa.Table:
    """Field collapsing (``{!collapse field=lang}``,
    `solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java`):
    keep only the top-scoring doc per collapse-field value in the result set
    (group head = max float32 BM25 score, ties -> lower docID; null field
    values dropped, the default nullPolicy=ignore), heads ranked
    (score desc, doc_id) — S-gated via the float32 BM25 SQL replay."""
    ix = documents_index(sf_dir)
    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    docs, scores = ev.scored(TermQ("join"))
    od, ov = loc.numeric_values("lang_ord")
    ords = ov[np.searchsorted(od, docs)].astype(np.int64)
    live = ords >= 0  # negative ordinal = missing value (nullPolicy=ignore)
    docs, scores, ords = docs[live], scores[live], ords[live]
    # head per group: lexsort (ord asc, score desc, doc asc) -> first per ord
    order = np.lexsort((docs, -scores, ords))
    first = np.ones(len(order), dtype=bool)
    first[1:] = ords[order][1:] != ords[order][:-1]
    heads = order[first]
    hd, hs, ho = docs[heads], scores[heads], ords[heads]
    rank_order = np.lexsort((hd, -hs))
    langs = loc.stats.dicts["lang"]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(rank_order)), type=pa.int64()),
            "lang": pa.array([langs[o] for o in ho[rank_order]], type=pa.string()),
            "doc_id": pa.array(hd[rank_order], type=pa.int64()),
        }
    )


def rerank_topk_simple(sf_dir: str) -> pa.Table:
    """ReRank under the SQL gate: first pass = 'join OR vector' top-20, then
    +2.0x the 'hash' score for matches (ReRankQParserPlugin semantics,
    float32 combine), final top-10 ranks."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        combined = s.rerank(
            BoolQ(should=(TermQ("join"), TermQ("vector"))),
            TermQ("hash"), k=10, rerank_docs=20, rerank_weight=2.0,
        )
        return pa.table(
            {
                "rank": pa.array(range(len(combined)), type=pa.int64()),
                "doc_id": pa.array([d for _, d in combined], type=pa.int64()),
            }
        )
    finally:
        s.shutdown()


def search_after_page2(sf_dir: str) -> pa.Table:
    """cursorMark deep paging under the SQL gate: ranks 10-19 of the 'join'
    BM25 ranking fetched via the (score, doc_id) cursor of page 1."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        page1 = s.search_after(TermQ("join"), None, k=10)
        page2 = s.search_after(TermQ("join"), page1["next_cursor"], k=10)
        return pa.table(
            {
                "rank": pa.array(range(10, 10 + len(page2["topk"])), type=pa.int64()),
                "doc_id": pa.array([d for _, d in page2["topk"]], type=pa.int64()),
            }
        )
    finally:
        s.shutdown()


def elevation_topk(sf_dir: str) -> pa.Table:
    """Query elevation under the SQL gate: two pinned ids first (given
    order), then organic 'join' ranking with the pinned ids deduplicated."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        pinned = [7, 3]
        res = s.search_elevated(TermQ("join"), pinned, k=10)
        return pa.table(
            {
                "rank": pa.array(range(len(res)), type=pa.int64()),
                "doc_id": pa.array([d for _, d in res], type=pa.int64()),
            }
        )
    finally:
        s.shutdown()


def edismax_topk(sf_dir: str) -> pa.Table:
    """edismax end-to-end under the SQL gate: 'join vector' with mm=1 over
    the text field — disjunction of BM25 term scores (float64 accumulation
    cast to float32), rank order checked against the SQL recomputation."""
    from ..query.edismax import EDisMaxParser

    ast = EDisMaxParser(qf=(("text", 1.0),), mm=1).parse("join vector")
    ix = documents_index(sf_dir)
    docs, scores = Evaluator(LocalIndex(ix)).scored(ast)
    out = {"rank": [], "doc_id": []}
    for rank, (_s, doc) in enumerate(top_k(docs, scores, 20)):
        out["rank"].append(rank)
        out["doc_id"].append(doc)
    return pa.table(
        {
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        }
    )


def bm25_and_topk(sf_dir: str) -> pa.Table:
    ix = documents_index(sf_dir, analyzer="standard")
    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    out = {"qid": [], "rank": [], "doc_id": [], "score": []}
    pairs = [("join", "hash"), ("window", "stream"), ("vector", "customer")]
    for qid, (a, b) in enumerate(pairs):
        docs, scores = ev.scored(BoolQ(must=(TermQ(a), TermQ(b))))
        for rank, (score, doc) in enumerate(top_k(docs, scores, 10)):
            out["qid"].append(qid)
            out["rank"].append(rank)
            out["doc_id"].append(doc)
            out["score"].append(float(score))
    return pa.table(out)


def shingle_top_bigrams(sf_dir: str) -> pa.Table:
    """ShingleFilter as a corpus statistic: top-20 adjacent-word bigrams.

    Vectorized: one token flatten per batch, Arrow binary_join of shifted
    token arrays masked to same-document pairs, per-batch Arrow group_by
    partial counts (combiner), one tiny groupby-sum."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ..stages.textstats import _token_lists

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        flat, row_of, tok_len = _token_lists(t["text"])
        keep = tok_len > 0
        toks = flat.filter(pa.array(keep))
        rows = row_of[keep]
        if len(toks) < 2:
            return pa.table({"bigram": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())})
        joined = pc.binary_join_element_wise(
            toks.slice(0, len(toks) - 1), toks.slice(1), "_"
        )
        same_row = rows[:-1] == rows[1:]
        pairs = joined.filter(pa.array(same_row))
        return (
            pa.table({"bigram": pairs})
            .group_by("bigram")
            .aggregate([("bigram", "count")])
            .rename_columns(["bigram", "n"])
        )

    out = (
        ds.map_batches(bigram_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "bigram"], ascending=[False, True])
        .head(20)
    )
    return _rank_table({"bigram": out["bigram"].tolist(), "n": out["n"].astype("int64").tolist()})


def stats_full_nchars(sf_dir: str) -> pa.Table:
    """StatsComponent full surface incl. sumOfSquares and stddev
    (`StatsValuesFactory.java` NumericStatsValues: stddev =
    sqrt((sumsq - sum^2/count)/(count-1))) — exact integer partials per
    batch (combiner), one double formula at the end."""
    import math

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["n_chars"], dtype=np.int64)
        return pa.table(
            {
                "cnt": pa.array([len(v)], type=pa.int64()),
                "sum_c": pa.array([int(v.sum())], type=pa.int64()),
                "sumsq_c": pa.array([int((v * v).sum())], type=pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    cnt = sum(r["cnt"] for r in rows)
    sum_c = sum(r["sum_c"] for r in rows)
    sumsq_c = sum(r["sumsq_c"] for r in rows)
    if cnt < 2:
        stddev = 0.0  # sample stddev undefined below 2 rows (oracle: NULL->0)
    else:
        # clamp: float64 rounding of sum^2/cnt can dip the radicand just
        # below 0 on near-constant data
        stddev = math.sqrt(
            max(0.0, (sumsq_c - float(sum_c) * float(sum_c) / cnt) / (cnt - 1))
        )
    return pa.table(
        {
            "cnt": pa.array([cnt], type=pa.int64()),
            "sum_c": pa.array([sum_c], type=pa.int64()),
            "sumsq_c": pa.array([sumsq_c], type=pa.int64()),
            "stddev_c": pa.array([stddev], type=pa.float64()),
        }
    )


def suggest_prefix(sf_dir: str) -> pa.Table:
    """AnalyzingSuggester analog: top-10 completions per prefix, weighted by
    total term frequency — a sorted-dictionary range scan per prefix."""
    from ..index.reader import GlobalStats
    from ..query.suggest import PrefixSuggester

    ix = documents_index(sf_dir)
    sg = PrefixSuggester(GlobalStats(ix))
    out = {"prefix": [], "rank": [], "term": [], "weight": []}
    for pref in ["co", "pre", "st"]:
        for rank, (term, w) in enumerate(sg.suggest(pref, top=10)):
            out["prefix"].append(pref)
            out["rank"].append(rank)
            out["term"].append(term)
            out["weight"].append(w)
    return pa.table(
        {
            "prefix": pa.array(out["prefix"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "term": pa.array(out["term"], type=pa.string()),
            "weight": pa.array(out["weight"], type=pa.int64()),
        }
    )


def spellcheck_terms(sf_dir: str) -> pa.Table:
    """DirectSpellChecker analog: corrections within 2 edits ranked
    (distance asc, df desc, term asc), top 5 per misspelling."""
    from ..index.reader import GlobalStats
    from ..query.suggest import spellcheck

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    out = {"word": [], "rank": [], "suggestion": [], "dist": [], "df": []}
    for word in sorted(["joyn", "vectr", "strem"]):
        for rank, (sug, d, df) in enumerate(spellcheck(stats, word, top=5)):
            out["word"].append(word)
            out["rank"].append(rank)
            out["suggestion"].append(sug)
            out["dist"].append(d)
            out["df"].append(df)
    return pa.table(
        {
            "word": pa.array(out["word"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "suggestion": pa.array(out["suggestion"], type=pa.string()),
            "dist": pa.array(out["dist"], type=pa.int64()),
            "df": pa.array(out["df"], type=pa.int64()),
        }
    )


def spellcheck_collation(sf_dir: str) -> pa.Table:
    """SpellCheckCollator analog (`spelling/SpellCheckCollator.java:60-140`):
    the misspelled query "custoner joim" gets its out-of-dictionary terms
    replaced by the top-1 DirectSpellChecker suggestion (distance asc, df
    desc, term asc — replayed verbatim by the DuckDB oracle via
    ``levenshtein`` over the distinct-token dictionary), then the collation
    is re-run as a conjunction and its hit count reported — the reference's
    collation-verification step."""
    from ..index.reader import GlobalStats
    from ..query.suggest import spellcheck_collate

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    corrected = spellcheck_collate(stats, ["custoner", "joim"], max_edits=2)
    q = BoolQ(must=tuple(TermQ(t) for t in corrected))
    docs, _ = Evaluator(LocalIndex(ix)).scored(q)
    return pa.table(
        {
            "collation": pa.array([" ".join(corrected)], type=pa.string()),
            "hits": pa.array([len(docs)], type=pa.int64()),
        }
    )


def spellcheck_collations_docs(sf_dir: str) -> pa.Table:
    """Multi-collation search (`spelling/SpellCheckCollator.java:66-185` with
    ``maxCollationTries`` — the combination search the top-1-only entry
    ``spellcheck_collation`` does not exercise): the misspelled PHRASE query
    ``"dat dupp"`` enumerates correction combinations via the
    PossibilityIterator odometer (rank = sum of per-term suggestion indices,
    tried in (rank, generation) order), each verified by re-running the
    collation AS A PHRASE (getCollation preserves the original query
    structure).  On this corpus the top combination ("data dup") has zero
    phrase hits — only a later try collates, so the gate covers the
    maxCollationTries loop, not just the first substitution.  Returns every
    TRIED collation in try order with its hit count and kept flag; the
    DuckDB oracle replays the same candidate ranking (levenshtein asc, df
    desc, term asc), the same odometer order, the same phrase-adjacency
    re-query, and the same stop rule (10 tries / 2 kept collations)."""
    from ..index.reader import GlobalStats
    from ..query.suggest import spellcheck_collations

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    ev = Evaluator(LocalIndex(ix))

    def verify(ws):
        docs, _ = ev.scored(PhraseQ(tuple(ws)))
        return len(docs)

    tried = spellcheck_collations(stats, ["dat", "dupp"], verify,
                                  max_edits=2, top_per_term=5,
                                  max_tries=10, max_collations=2)
    return pa.table({
        "try_no": pa.array([r["try_no"] for r in tried], type=pa.int64()),
        "collation": pa.array([" ".join(r["collation"]) for r in tried],
                              type=pa.string()),
        "hits": pa.array([r["hits"] for r in tried], type=pa.int64()),
        "kept": pa.array([r["kept"] for r in tried], type=pa.int64()),
    })


def complexphrase_search_docs(sf_dir: str) -> pa.Table:
    """ComplexPhrase parser subset (`ComplexPhraseQParserPlugin.java` /
    `complexPhrase/ComplexPhraseQueryParser.java`): a WILDCARD inside a
    quoted phrase — ``{!complexphrase}"cust* join"`` parses to
    SpanNear(SpanMulti(prefix cust), SpanTerm(join), slop=0, inOrder),
    the wrapper rewriting to SpanOr over the dictionary's prefix range
    before evaluation; the SQL oracle states the same contract
    positionally (a cust-prefixed token immediately followed by join)."""
    from ..query.parser import QueryParser

    q = QueryParser(analyzer="simple").parse('{!complexphrase}"cust* join"')
    return _search_docs(sf_dir, q)


def synonym_search_docs(sf_dir: str) -> pa.Table:
    """Query-time MULTI-WORD synonym expansion
    (`analysis/synonym/SynonymFilter.java:93-107` greedy longest-only
    matching + Solr sow=false query building): the query
    "scan customer join" under rules ``table hash, scan`` (equivalence:
    every member expands to the whole class) and
    ``customer join => merge group`` (explicit: input replaced) with
    q.op=AND yields hit set
    (scan OR "table hash") AND "merge group" — the two-token input
    "customer join" matches ACROSS whitespace, which is the graph behavior
    index-time single-token expansion cannot express."""
    from ..analysis.synonyms import SynonymMap, expand_synonyms

    syn = SynonymMap.parse(["table hash, scan", "customer join => merge group"])
    q = expand_synonyms("scan customer join", syn, analyzer="simple", op="and")
    return _search_docs(sf_dir, q)


# ---- faceting ---------------------------------------------------------------


def facet_lang_for_term(sf_dir: str) -> pa.Table:
    """Counts by lang over hits of term 'join' (count desc, value asc)."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        res = s.search(TermQ("join"), k=1, facet_fields=("lang",), facet_limit=100, facet_mincount=1)
        vals = [v for v, _ in res["facets"]["lang"]]
        cnts = [c for _, c in res["facets"]["lang"]]
        return _rank_table({"lang": vals, "n": cnts})
    finally:
        s.shutdown()


def suggest_infix(sf_dir: str) -> pa.Table:
    """AnalyzingInfixSuggester analog: terms CONTAINING each substring,
    (weight=ttf desc, term asc) top-10 — streamed shard-at-a-time dictionary
    scan with vectorized substring matching."""
    from ..index.reader import GlobalStats
    from ..query.suggest import infix_suggest

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    out = {"sub": [], "rank": [], "term": [], "weight": []}
    for sub in ("ar", "ow", "us"):
        for rank, (term, w) in enumerate(infix_suggest(stats, sub, top=10)):
            out["sub"].append(sub)
            out["rank"].append(rank)
            out["term"].append(term)
            out["weight"].append(w)
    return pa.table(
        {
            "sub": pa.array(out["sub"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "term": pa.array(out["term"], type=pa.string()),
            "weight": pa.array(out["weight"], type=pa.int64()),
        }
    )


def fuzzy_suggest_docs(sf_dir: str) -> pa.Table:
    """FuzzySuggester analog gate (`analyzing/FuzzySuggester.java:54-110`):
    "sman" (fuzzy: some prefix of the post-'s' remainder within 1 Damerau
    edit of "man" — matches scan via "can"@1 and small via "ma"/"mal"@1,
    exercising the completion-after-automaton-final semantics) and "jo"
    (shorter than minFuzzyLength=3: zero edits allowed, degrades to exact
    prefix completion).  Ranked (weight=ttf desc, term asc) per query; the
    DuckDB oracle replays the prefix-min Damerau condition with
    ``damerau_levenshtein`` over generate_series prefixes (the reference's
    transpositions=true default)."""
    from ..index.reader import GlobalStats
    from ..query.suggest import fuzzy_suggest

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    out = {"q": [], "rank": [], "term": [], "weight": []}
    for q in ("jo", "sman"):  # alphabetical: oracle row order is ORDER BY q
        for rank, (term, w) in enumerate(fuzzy_suggest(stats, q, top=10)):
            out["q"].append(q)
            out["rank"].append(rank)
            out["term"].append(term)
            out["weight"].append(w)
    return pa.table(
        {
            "q": pa.array(out["q"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "term": pa.array(out["term"], type=pa.string()),
            "weight": pa.array(out["weight"], type=pa.int64()),
        }
    )


def free_text_suggest_docs(sf_dir: str) -> pa.Table:
    """FreeTextSuggester gate (`analyzing/FreeTextSuggester.java:66-131`):
    "data d" (context 'data', prefix 'd' — bigram completion with unigram
    stupid-backoff at ALPHA=0.4), "sc" (no context — pure unigram order),
    "the " (trailing separator — next-word suggestion, empty prefix, full
    backoff vocabulary).  The DuckDB oracle replays the 2-gram counts, the
    backoff formula and the (score desc, term asc) ranking verbatim."""
    from ..stages.textstats import free_text_suggest

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    rows = free_text_suggest(ds, ["data d", "sc", "the "], top=10)
    return pa.table(
        {
            "q": pa.array([r[0] for r in rows], type=pa.string()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "term": pa.array([r[2] for r in rows], type=pa.string()),
            "score": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )


def blended_infix_suggest_docs(sf_dir: str) -> pa.Table:
    """BlendedInfixSuggester analog
    (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/BlendedInfixSuggester.java:60-150`):
    infix term-prefix match anywhere in the suggestion, score = weight
    blended by the FIRST matching token's position with the
    POSITION_RECIPROCAL coefficient ``1/(1+position)``
    (`BlendedInfixSuggester.java:253-262`).  Suggestion corpus = each
    document's first 8 simple-analyzer tokens, weight = the doc's full
    token count (both SQL-replayable); suggestions keyed by doc_id.
    Queries 'jo' and 'sor'; top-10 per query ranked (score desc, doc_id
    asc).  Fully distributed: one vectorized pass computes per-doc first
    match positions and a per-block partial top-10; the driver merges
    <= 10 * blocks rows."""
    from ..stages.textstats import _token_lists

    qs = ["jo", "sor"]
    K = 8
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def part(batch: pa.Table) -> pa.Table:
        flat, row_of, tok_len = _token_lists(batch["text"])
        keep = tok_len > 0
        toks = flat.filter(pa.array(keep))
        rows = row_of[keep]
        n = batch.num_rows
        counts = np.bincount(rows, minlength=n).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(len(rows), dtype=np.int64) - starts[rows]
        first = pos < K
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        out_q: list[str] = []
        out_id: list[int] = []
        out_s: list[float] = []
        for q in qs:
            m = pc.starts_with(toks, q).to_numpy(zero_copy_only=False).astype(bool)
            m &= first
            if not m.any():
                continue
            mrows, mpos = rows[m], pos[m]
            order = np.lexsort((mpos, mrows))
            mrows, mpos = mrows[order], mpos[order]
            fm = np.ones(len(mrows), dtype=bool)
            fm[1:] = mrows[1:] != mrows[:-1]
            drow, dpos = mrows[fm], mpos[fm]
            score = counts[drow].astype(np.float64) / (dpos + 1)
            idx = np.lexsort((ids[drow], -score))[:10]
            out_q.extend([q] * len(idx))
            out_id.extend(ids[drow][idx].tolist())
            out_s.extend(score[idx].tolist())
        return pa.table(
            {
                "q": pa.array(out_q, type=pa.string()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    parts = _concat_or_empty(
        ds.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow"),
        pa.schema([("q", pa.string()), ("doc_id", pa.int64()),
                   ("score", pa.float64())]),
    )
    out = {"q": [], "rank": [], "doc_id": [], "score": []}
    for q in qs:
        sub = parts.filter(pc.equal(parts["q"], q))
        idx = np.lexsort(
            (np.asarray(sub["doc_id"], dtype=np.int64),
             -np.asarray(sub["score"], dtype=np.float64))
        )[:10]
        sub = sub.take(idx)
        for rank in range(sub.num_rows):
            out["q"].append(q)
            out["rank"].append(rank)
            out["doc_id"].append(sub["doc_id"][rank].as_py())
            out["score"].append(round(sub["score"][rank].as_py(), 6))
    return pa.table(
        {
            "q": pa.array(out["q"], type=pa.string()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "score": pa.array(out["score"], type=pa.float64()),
        }
    )


def facet_source_prefix(sf_dir: str) -> pa.Table:
    """facet.prefix=src1 over hits of term 'join': the sorted facet
    dictionary makes the prefix an ORDINAL RANGE (`SimpleFacets.java`
    FACET_PREFIX handling / `SparseDocValuesFacets.java:201-224` lookupTerm
    bounds), applied as a vectorized mask in the merge."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        res = s.search(
            TermQ("join"), k=1, facet_fields=("source",),
            facet_limit=100, facet_mincount=1, facet_prefix="src1",
        )
        vals = [v for v, _ in res["facets"]["source"]]
        cnts = [c for _, c in res["facets"]["source"]]
        return _rank_table({"source": vals, "n": cnts})
    finally:
        s.shutdown()


def search_with_deletes(sf_dir: str) -> pa.Table:
    """deleteDocuments + liveDocs under the SQL gate: a dedicated index copy
    tombstones every doc with doc_id % 7 == 3 (by-id) plus every doc
    containing 'dup' (by-query, `IndexWriter.deleteDocuments(Query)`), then
    the hit set of 'join AND vector' must equal the oracle's live filter.
    Stats stay stale (Lucene semantics) so this gates the hit SET mask."""
    from ..index.deletes import apply_deletes
    from ..index.reader import LocalIndex

    ix = documents_index(sf_dir, variant="del1")
    # Seed unconditionally: both calls are idempotent (by-id dedups against
    # prior generations; by-query can't match already-deleted docs; zero new
    # ids writes no generation file), so a crash between them can't leave
    # the cached index half-seeded the way a len(load_deleted)==0 guard did.
    import pyarrow.parquet as pqf

    ids = pqf.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy()
    apply_deletes(ix, doc_ids=ids[ids % 7 == 3])
    apply_deletes(ix, query=TermQ("dup"))
    docs, _ = Evaluator(LocalIndex(ix)).scored(
        BoolQ(must=(TermQ("join"), TermQ("vector")))
    )
    return pa.table({"doc_id": pa.array(np.sort(docs), type=pa.int64())})


def expunge_index_stats(sf_dir: str) -> pa.Table:
    """expungeDeletes under the SQL gate: after tombstoning doc_id % 7 == 3
    and rewriting (`IndexWriter.forceMergeDeletes` analog), the GLOBAL
    statistics reflect only survivors — maxdoc, per-term docfreq and the live
    hit set must equal the oracle's direct computation over live docs."""
    from ..index.deletes import apply_deletes, expunge_deletes, load_deleted
    from ..index.reader import GlobalStats, LocalIndex

    src_ix = documents_index(sf_dir, variant="del2")
    if len(load_deleted(src_ix)) == 0:
        import pyarrow.parquet as pqf

        ids = pqf.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )["doc_id"].to_numpy()
        apply_deletes(src_ix, doc_ids=ids[ids % 7 == 3])
    out_ix = src_ix + "_expunged"
    if not os.path.exists(os.path.join(out_ix, "manifest.json")):
        expunge_deletes(src_ix, out_ix)
    stats = GlobalStats(out_ix)
    docs, _ = Evaluator(LocalIndex(out_ix)).scored(TermQ("join"))
    return pa.table(
        {
            "maxdoc": pa.array([stats.max_doc], type=pa.int64()),
            "docfreq_join": pa.array([stats.df.get("join", 0)], type=pa.int64()),
            "ttf_join": pa.array([stats.ttf.get("join", 0)], type=pa.int64()),
            "n_hits_join": pa.array([len(docs)], type=pa.int64()),
        }
    )


def facet_refined_lang(sf_dir: str) -> pa.Table:
    """Distributed facet over-request + refinement under the SQL gate: actors
    return only limit*1.5+10 entries (`FacetComponent.java:495-503`), then
    possibly-undercounted candidates get exact per-ordinal recounts
    (`FacetComponent.refineFacets:802-822`) — the refined result must equal
    the exact counts the oracle computes directly."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        res = s.search(
            TermQ("join"), k=1, facet_fields=("lang",),
            facet_limit=3, facet_mincount=1, facet_overrequest=True,
        )
        vals = [v for v, _ in res["facets"]["lang"]]
        cnts = [c for _, c in res["facets"]["lang"]]
        return _rank_table({"lang": vals, "n": cnts})
    finally:
        s.shutdown()


def mlt_topk_docs(sf_dir: str) -> pa.Table:
    """MoreLikeThis (`MoreLikeThis.java` / `MoreLikeThisHandler.java`): docs
    most similar to doc 42, via the top tf*idf_classic source terms
    (tf>=2, df>=5, max 10 terms) as an unboosted BM25 disjunction through
    the distributed searcher; source doc excluded.  S-gated: the oracle
    recomputes term selection AND full float32 BM25 in SQL."""
    import pyarrow.parquet as pqf

    from ..index.reader import LocalIndex
    from ..query.mlt import mlt_query

    SRC_DOC = 42
    ix = documents_index(sf_dir)
    # point lookup: predicate pushdown fetches one row-group's worth, not
    # the whole corpus text column onto the driver
    tbl = pqf.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "=", SRC_DOC)],
    )
    text = tbl["text"][0].as_py()
    loc = LocalIndex(ix)
    q = mlt_query(text, loc, analyzer="simple",
                  min_term_freq=2, min_doc_freq=5, max_query_terms=10)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        res = s.search(q, k=11)
    finally:
        s.shutdown()
    ranks, dids = [], []
    for _score, doc in res["topk"]:
        if doc == SRC_DOC:
            continue
        if len(ranks) >= 10:
            break
        ranks.append(len(ranks))
        dids.append(doc)
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(dids, type=pa.int64()),
        }
    )


def pivot_refined_lang_source(sf_dir: str) -> pa.Table:
    """Distributed two-level pivot (lang x source) over hits of term 'join',
    through the over-request + refinement protocol
    (`PivotFacetProcessor.java` analog; searcher.pivot_facets) — flattened to
    (lang, lang_n, source, source_n) rows in tree order."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=3)
    try:
        tree = s.pivot_facets(
            TermQ("join"), ("lang", "source"),
            limit=10**6, sub_limit=10**6, mincount=1, overrequest=True,
        )
    finally:
        s.shutdown()
    langs, lang_ns, sources, source_ns = [], [], [], []
    for pv, pn, children in tree:
        for cv, cn in children:
            langs.append(pv)
            lang_ns.append(pn)
            sources.append(cv)
            source_ns.append(cn)
    return _rank_table(
        {
            "lang": langs,
            "lang_n": [int(n) for n in lang_ns],
            "source": sources,
            "source_n": [int(n) for n in source_ns],
        }
    )


def facet_source_all(sf_dir: str) -> pa.Table:
    """Match-all facet on source with mincount=1."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        from ..query.ast import MatchAllQ

        res = s.search(MatchAllQ(), k=1, facet_fields=("source",), facet_limit=1000, facet_mincount=1)
        vals = [v for v, _ in res["facets"]["source"]]
        cnts = [c for _, c in res["facets"]["source"]]
        return _rank_table({"source": vals, "n": cnts})
    finally:
        s.shutdown()


def facet_source_index_order(sf_dir: str) -> pa.Table:
    """facet.sort=index: match-all facet on source in dictionary order."""
    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        from ..query.ast import MatchAllQ

        res = s.search(
            MatchAllQ(), k=1, facet_fields=("source",), facet_limit=1000,
            facet_mincount=1, facet_sort="index",
        )
        vals = [v for v, _ in res["facets"]["source"]]
        cnts = [c for _, c in res["facets"]["source"]]
        return pa.table(
            {"source": pa.array(vals, type=pa.string()), "n": pa.array(cnts, type=pa.int64())}
        )
    finally:
        s.shutdown()


def function_query_index_stats(sf_dir: str) -> pa.Table:
    """Index-statistics ValueSources per doc (`ValueSourceParser.java:591-649`
    registry: docfreq / termfreq / maxdoc / numdocs; idf et al. are the same
    lookups composed): evaluated from the index artifacts, checked against
    SQL recomputation from raw text."""
    ix = documents_index(sf_dir)
    loc = LocalIndex(ix)
    term = "join"
    docs, tfs = loc.postings("text", term)
    tf_map = dict(zip(docs.tolist(), tfs.tolist()))
    all_docs = np.sort(loc.all_docs())
    df = loc.global_df("text", term)
    n = loc.global_stats("text")[0]
    return pa.table(
        {
            "doc_id": pa.array(all_docs, type=pa.int64()),
            "termfreq_join": pa.array([tf_map.get(int(d), 0) for d in all_docs], type=pa.int64()),
            "docfreq_join": pa.array([df] * len(all_docs), type=pa.int64()),
            "maxdoc": pa.array([n] * len(all_docs), type=pa.int64()),
        }
    )


def facet_queries_counts(sf_dir: str) -> pa.Table:
    """facet.query analog (`SimpleFacets.java:251-271`): hit counts of
    arbitrary sub-queries, evaluated against the index."""
    ix = documents_index(sf_dir)
    loc = LocalIndex(ix)
    ev = Evaluator(loc)
    subqueries = [
        ("q_join", TermQ("join")),
        ("q_join_and_vector", BoolQ(must=(TermQ("join"), TermQ("vector")))),
        ("q_window_or_stream", BoolQ(should=(TermQ("window"), TermQ("stream")))),
        ("q_phrase_join_hash", PhraseQ(("join", "hash"))),
    ]
    names, counts = [], []
    for name, ast in subqueries:
        docs, _ = ev.scored(ast)
        names.append(name)
        counts.append(len(docs))
    return pa.table({"facet_query": pa.array(names), "n": pa.array(counts, type=pa.int64())})


def facet_range_nchars(sf_dir: str) -> pa.Table:
    """Range facet on n_chars: gap 100 buckets (IntervalFacets analog)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"])

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), 100.0)), pa.int64())
        return pa.table({"bucket": b})

    from ray.data.aggregate import Count

    out = ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    out = out.sort_values("bucket")
    return pa.table({"bucket": out["bucket"].astype("int64").tolist(), "n": out["n"].astype("int64").tolist()})


def pivot_lang_source(sf_dir: str) -> pa.Table:
    """Pivot facet: nested lang x source counts (count desc, lang, source)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"])
    from ray.data.aggregate import Count

    out = ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n")).to_pandas()
    out = out.sort_values(["n", "lang", "source"], ascending=[False, True, True])
    return _rank_table(
        {"lang": out["lang"].tolist(), "source": out["source"].tolist(), "n": out["n"].astype("int64").tolist()}
    )


def stats_nchars_by_lang(sf_dir: str) -> pa.Table:
    """StatsComponent analog: min/max/sum/count/mean of n_chars per lang."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(
            Min("n_chars", alias_name="min_c"),
            Max("n_chars", alias_name="max_c"),
            Sum("n_chars", alias_name="sum_c"),
            Count(alias_name="cnt"),
            Mean("n_chars", alias_name="mean_c"),
        )
        .to_pandas()
        .sort_values("lang")
    )
    return pa.table(
        {
            "lang": out["lang"].tolist(),
            "min_c": out["min_c"].astype("int64").tolist(),
            "max_c": out["max_c"].astype("int64").tolist(),
            "sum_c": out["sum_c"].astype("int64").tolist(),
            "cnt": out["cnt"].astype("int64").tolist(),
            "mean_c": out["mean_c"].astype("float64").tolist(),
        }
    )


TV_DOC_IDS = [0, 1, 2, 3, 4]
RTG_DOC_IDS = [2, 3, 5, 8, 13, 21, 34]


def term_vectors_docs(sf_dir: str) -> pa.Table:
    """TermVectorsComponent (``tv=true`` with tf + first position,
    `solr/core/src/java/org/apache/solr/handler/component/TermVectorComponent.java`;
    store shape `lucene/core/src/java/org/apache/lucene/codecs/compressing/
    CompressingTermVectorsReader.java`): per-doc term vectors served from the
    index's DOC-ORIENTED tokenized checkpoint (our .tvd/.tvf analog — the
    inverted postings are the wrong store for a by-document read).  Parquet
    predicate pushdown fetches only the requested docs' rows; nothing else is
    read or resident."""
    import pyarrow.parquet as pq

    ix = documents_index(sf_dir)
    t = pq.read_table(
        os.path.join(ix, "tokenized"),
        columns=["doc_id", "terms", "tfs", "positions"],
        filters=[("doc_id", "in", TV_DOC_IDS)],
    ).combine_chunks()
    terms = t["terms"].combine_chunks() if isinstance(t["terms"], pa.ChunkedArray) else t["terms"]
    tfs = t["tfs"].combine_chunks() if isinstance(t["tfs"], pa.ChunkedArray) else t["tfs"]
    pos = t["positions"].combine_chunks() if isinstance(t["positions"], pa.ChunkedArray) else t["positions"]
    n_terms = pc.fill_null(terms.value_lengths(), 0).to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(np.asarray(t["doc_id"], dtype=np.int64), n_terms)
    inner = pos.flatten()  # one list<int32> per (doc, term)
    first = np.asarray(inner.values)[np.asarray(inner.offsets)[:-1]]
    out = pa.table(
        {
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "term": terms.flatten(),
            "tf": pc.cast(tfs.flatten(), pa.int64()),
            "first_pos": pa.array(first.astype(np.int64), type=pa.int64()),
        }
    )
    return out.sort_by([("doc_id", "ascending"), ("term", "ascending")])


def realtime_get_docs(sf_dir: str) -> pa.Table:
    """RealTimeGet surface (``/get?ids=...``,
    `solr/core/src/java/org/apache/solr/handler/component/RealTimeGetComponent.java`):
    point fetch of doc-values fields by uniqueKey through the distributed
    STAGE_GET_FIELDS round-trip (each actor answers only for the ids it
    owns); facet ordinals decode through the global value dictionaries."""
    from ..index.searcher import RayIndexSearcher

    ix = documents_index(sf_dir)
    s = RayIndexSearcher(ix, num_actors=2)
    try:
        got = s.fetch_fields(RTG_DOC_IDS, ["lang_ord", "source_ord", "n_chars"])
        dicts = s.stats.dicts
    finally:
        s.shutdown()
    ids = sorted(got)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "lang": pa.array(
                [dicts["lang"][got[d]["lang_ord"]] for d in ids], type=pa.string()
            ),
            "source": pa.array(
                [dicts["source"][got[d]["source_ord"]] for d in ids], type=pa.string()
            ),
            "n_chars": pa.array([int(got[d]["n_chars"]) for d in ids], type=pa.int64()),
        }
    )


def edismax_bq_topk(sf_dir: str) -> pa.Table:
    """edismax with an additive boost QUERY under the SQL gate:
    'join vector' mm=1 plus ``bq=hash^2`` (`DisMaxQParser.java`
    ``getBoostQueries``): the bq clause's f32 BM25 score (×2 boost) adds to
    matching docs via ReqOptSumScorer, never gates matching."""
    from ..query.edismax import EDisMaxParser

    ast = EDisMaxParser(
        qf=(("text", 1.0),), mm=1, bq=(TermQ("hash", boost=2.0),)
    ).parse("join vector")
    ix = documents_index(sf_dir)
    docs, scores = Evaluator(LocalIndex(ix)).scored(ast)
    ranks, ids = [], []
    for rank, (_s, doc) in enumerate(top_k(docs, scores, 20)):
        ranks.append(rank)
        ids.append(doc)
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        }
    )


def edismax_bf_topk(sf_dir: str) -> pa.Table:
    """edismax with an additive boost function under the SQL gate:
    'join vector' mm=1 plus ``bf=log(n_chars)``
    (`solr/core/src/java/org/apache/solr/search/DisMaxQParser.java`
    ``getBoostFunctions``; value source `LogFloatFunction` = log10).  Engine
    float semantics: disjunction f64-accumulated -> f32, bf value
    f32(log10(f64 n_chars)), ReqOptSumScorer f32 addition — the oracle
    replays the same op order (two-f32-add via DOUBLE then FLOAT cast is
    exact by the 2p+2 double-rounding theorem)."""
    from ..query.ast import FunctionQ
    from ..query.edismax import EDisMaxParser

    ast = EDisMaxParser(
        qf=(("text", 1.0),), mm=1, bf=(FunctionQ("n_chars", fn="log"),)
    ).parse("join vector")
    ix = documents_index(sf_dir)
    docs, scores = Evaluator(LocalIndex(ix)).scored(ast)
    ranks, ids = [], []
    for rank, (_s, doc) in enumerate(top_k(docs, scores, 20)):
        ranks.append(rank)
        ids.append(doc)
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        }
    )


def payload_score_docs(sf_dir: str) -> pa.Table:
    """Payload queries under the SQL gate (`PayloadScoreQuery.java` with
    Min/MaxPayloadFunction; Solr `{!payload_score}`): documents re-tokenized
    through the DelimitedPayloadTokenFilter chain with each whitespace token
    carrying its 1-based position as the float payload (``tok|i``), indexed
    with ``analyzer='whitespace_payload'``; ``{!payload_score func=min}`` /
    ``func=max`` on 'customer' then return the first/last whitespace
    position per matching doc — positions are small integers so the float32
    scores replay exactly in SQL via list positional filters."""
    from ..query.parser import QueryParser

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_size}:{st.st_mtime_ns}:payloadv2".encode()
    ).hexdigest()[:16]
    root = os.path.join(CACHE_ROOT, "payload_" + key)
    derived = os.path.join(root, "docs")
    marker = os.path.join(root, "_docs_done")
    if not os.path.exists(marker):
        # distributed rewrite: the per-token "tok|pos" join runs inside
        # map_batches workers (bounded per batch), never materializing the
        # corpus on the driver; the marker commits the multi-file output
        import ray.data as rd

        def rewrite(t: pa.Table) -> pa.Table:
            texts = [
                " ".join(f"{w}|{i + 1}" for i, w in enumerate((x or "").split()))
                for x in t["text"].to_pylist()
            ]
            return pa.table(
                {"doc_id": t["doc_id"], "text": pa.array(texts, type=pa.string())}
            )

        os.makedirs(root, exist_ok=True)
        (
            rd.read_parquet(src, columns=["doc_id", "text"])
            .map_batches(rewrite, batch_format="pyarrow")
            .write_parquet(derived)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    files = sorted(
        os.path.join(derived, f)
        for f in os.listdir(derived)
        if f.endswith(".parquet")
    )
    ix = os.path.join(root, "ix")
    build_index(
        files,
        ix,
        rows_per_partition=128,
        extract_html=False,
        dedup_url=False,
        analyzer="whitespace_payload",
        facet_fields=(),
        resume=True,
    )
    P = QueryParser()
    ev = Evaluator(LocalIndex(ix))
    d1, s1 = ev.scored(P.parse("{!payload_score func=min}customer"))
    d2, s2 = ev.scored(P.parse("{!payload_score func=max}customer"))
    assert np.array_equal(d1, d2)
    return pa.table(
        {
            "doc_id": pa.array(d1, type=pa.int64()),
            "first_pos": pa.array(s1.astype(np.float64)),
            "last_pos": pa.array(s2.astype(np.float64)),
        }
    )
