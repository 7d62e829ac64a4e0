"""ClassicSimilarity (TF-IDF) + eval-set decontamination gates.

TF-IDF: independent brute-force oracle — tokenize the raw sf0.001 corpus in
Python, compute tf/df/dl, and replay DefaultSimilarity/TFIDFSimilarity float32
math WITHOUT the index machinery; ranks must match the engine entry exactly.
Decontamination: planted-contamination fixture (a train doc sharing exactly
one 8-token window with an eval doc) + a no-false-positive assertion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _brute_tfidf_ranks() -> list[tuple[int, int, int]]:
    import re

    import pyarrow.parquet as pq

    from lucene_solr_ray.index import tfidf

    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    # tokenize exactly like the "simple" analyzer contract (lowercase
    # [a-z0-9]+ runs) — independent of the engine's analysis module
    toks = {d: [w for w in re.split(r"[^a-z0-9]+", (x or "").lower()) if w] for d, x in docs.items()}
    n = len(toks)
    from lucene_solr_ray.smallfloat import encode_norm

    queries = [("join",), ("window", "stream"), ("vector", "customer")]
    out = []
    for qid, terms in enumerate(queries):
        dfs = [sum(1 for tk in toks.values() if t in tk) for t in terms]
        idfs = [tfidf.idf(df, n) for df in dfs]
        qn = tfidf.query_norm(tfidf.sum_sq_weights(idfs))
        scores: dict[int, float] = {}
        for t, idf_v in zip(terms, idfs):
            value = tfidf.term_value(idf_v, qn)
            for d, tk in toks.items():
                tf = tk.count(t)
                if tf == 0:
                    continue
                nb = encode_norm(np.array([len(tk)]))[0]
                s = tfidf.term_scores(
                    np.array([tf]), np.array([nb]), value
                )[0]
                scores[d] = scores.get(d, 0.0) + float(s)
        ranked = sorted(scores.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))[:10]
        for rank, (d, _s) in enumerate(ranked):
            out.append((qid, rank, d))
    return out


def test_tfidf_topk_matches_brute(ray_session):
    from lucene_solr_ray.pipelines.fulltext import tfidf_topk_simple

    got = tfidf_topk_simple(SF)
    eng = list(zip(got["qid"].to_pylist(), got["rank"].to_pylist(), got["doc_id"].to_pylist()))
    assert eng == _brute_tfidf_ranks()


def test_tfidf_float_points():
    """idf/queryNorm/value replicate the Java op order on crafted stats."""
    from lucene_solr_ray.index import tfidf

    # idf: (float)(ln(100/(9+1)) + 1)
    assert tfidf.idf(9, 100) == np.float32(np.log(10.0) + 1.0)
    # single-term queryNorm: 1/sqrt(idf^2) with f32 square
    v = tfidf.idf(9, 100)
    ss = tfidf.sum_sq_weights([v])
    assert ss == np.float32(np.float32(v * v))
    qn = tfidf.query_norm(ss)
    assert qn == np.float32(1.0 / np.sqrt(float(ss)))
    # zero sum -> inf -> guard to 1.0 (IndexSearcher.createNormalizedWeight)
    assert tfidf.query_norm(np.float32(0.0)) == np.float32(1.0)


def test_decontaminate_planted(ray_session):
    import ray.data as rd

    from lucene_solr_ray.stages.dedup import decontaminate

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    eval_rows = [
        {"doc_id": 0, "text": f"evalprefix {shared} evalsuffix"},
        {"doc_id": 97, "text": "totally different held out content here okay fine"},
    ]
    train_rows = [
        # shares exactly ONE 8-token window (surrounding tokens differ)
        {"doc_id": 5, "text": f"trainlead {shared} traintail"},
        # clean doc: no 8-token overlap
        {"doc_id": 6, "text": "the quick brown fox jumps over lazy dogs again and again today"},
        # shares a 7-token subspan only -> NOT flagged at n=8
        {"doc_id": 7, "text": "x alpha bravo charlie delta echo foxtrot golf y"},
    ]
    out = decontaminate(
        rd.from_items(train_rows), rd.from_items(eval_rows), n=8
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated_grams"]))
    assert got == {5: 1}


def test_decontaminate_counts_distinct_grams(ray_session):
    import ray.data as rd

    from lucene_solr_ray.stages.dedup import decontaminate

    text = "one two three four five six seven eight nine ten"
    # train doc contains the full eval doc -> shares all 3 of its 8-grams
    out = decontaminate(
        rd.from_items([{"doc_id": 1, "text": f"lead {text} tail"}]),
        rd.from_items([{"doc_id": 0, "text": text}]),
        n=8,
    ).to_pandas()
    assert dict(zip(out["doc_id"], out["n_contaminated_grams"])) == {1: 3}


def test_unigram_lm_planted(ray_session):
    import math

    import ray.data as rd

    from lucene_solr_ray.stages.textstats import unigram_lm_scores

    rows = [
        {"doc_id": 0, "text": "a a b"},
        {"doc_id": 1, "text": "b c"},
        {"doc_id": 2, "text": "..."},  # zero tokens
    ]
    out = unigram_lm_scores(rd.from_items(rows)).to_pandas().set_index("doc_id")
    # ttf: a=2 b=2 c=1, T=5
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "avg_logprob"] == round(math.log(0.4), 6)
    assert out.loc[1, "avg_logprob"] == round((math.log(0.4) + math.log(0.2)) / 2, 6)
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "avg_logprob"] == 0.0


def test_collapse_lang_invariants(ray_session):
    """Each lang appears once; every head beats all same-lang docs by
    (float32 score desc, doc_id) — checked against the engine's own scored()
    output plus raw lang values from the parquet (independent join path)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.pipelines.fulltext import collapse_lang_docs, documents_index
    from lucene_solr_ray.query.ast import Evaluator, TermQ

    got = collapse_lang_docs(SF)
    langs = got["lang"].to_pylist()
    assert len(langs) == len(set(langs))
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "lang"])
    lang_of = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    ev = Evaluator(LocalIndex(documents_index(SF)))
    docs, scores = ev.scored(TermQ("join"))
    best: dict[str, tuple] = {}
    for d, s in zip(docs.tolist(), scores.tolist()):
        lg = lang_of[d]
        if lg is None:
            continue
        key = (-np.float32(s), d)
        if lg not in best or key < best[lg][0]:
            best[lg] = (key, d)
    expect = {lg: v[1] for lg, v in best.items()}
    got_map = dict(zip(langs, got["doc_id"].to_pylist()))
    assert got_map == expect
    # ranks ordered by (score desc, doc_id)
    keys = [(-np.float32(dict(zip(docs.tolist(), scores.tolist()))[d]), d) for d in got["doc_id"].to_pylist()]
    assert keys == sorted(keys)


def test_bigram_lm_planted(ray_session):
    import math

    import ray.data as rd

    from lucene_solr_ray.stages.textstats import bigram_lm_scores

    rows = [
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "solo"},  # < 2 tokens -> 0 bigrams
    ]
    out = bigram_lm_scores(rd.from_items(rows)).to_pandas().set_index("doc_id")
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; lefts: a->3, b->2
    # doc0: ab ba ab -> ln(3/3), ln(1/2), ln(3/3)
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "avg_logprob"] == round(math.log(0.5) / 3, 6)
    # doc1: ab bc -> ln(3/3) + ln(1/2)
    assert out.loc[1, "n_bigrams"] == 2
    assert out.loc[1, "avg_logprob"] == round(math.log(0.5) / 2, 6)
    assert out.loc[2, "n_bigrams"] == 0 and out.loc[2, "avg_logprob"] == 0.0


def test_bigram_lm_matches_duckdb(ray_session):
    import os

    import duckdb

    import __ray_entry__
    from lucene_solr_ray.pipelines.relational import bigram_lm_docs

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        import pytest

        pytest.skip("testdata not present")
    got = bigram_lm_docs(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(__ray_entry__.oracle_sql()["bigram_lm_docs"]).fetchdf()
    assert len(got) == len(want) > 0
    import numpy as np

    for c in ("doc_id", "n_bigrams"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert np.array_equal(got["avg_logprob"].to_numpy(), want["avg_logprob"].to_numpy())
    # 63-bit-hash collision guard (ADVICE r4): the engine keys its LM count
    # tables by (h12>>1, h1>>1); a collision between distinct string bigrams
    # (or left tokens) would silently merge counts and break the gate.  Assert
    # the hash spaces are collision-free on THIS corpus: distinct string
    # count == distinct hash count for both tables.
    import re as _re

    import pyarrow.parquet as _pq

    from lucene_solr_ray.hashing import _MIX, hash_strings_u64
    import pyarrow as _pa

    texts = _pq.read_table(os.path.join(sf, "documents.parquet"),
                           columns=["text"])["text"].to_pylist()
    str_bigrams, str_lefts = set(), set()
    all_toks: list[str] = []
    bounds: list[tuple[int, int]] = []
    for txt in texts:
        toks = _re.findall(r"[a-z0-9]+", (txt or "").lower())
        bounds.append((len(all_toks), len(toks)))
        all_toks.extend(toks)
        for a, b in zip(toks, toks[1:]):
            str_bigrams.add((a, b))
            str_lefts.add(a)
    h = hash_strings_u64(_pa.array(all_toks))
    h12s, h1s = set(), set()
    with np.errstate(over="ignore"):
        for off, n in bounds:
            if n < 2:
                continue
            hh = h[off:off + n]
            h1 = hh[:-1]
            h12 = ((h1 * np.uint64(1099511628211) + hh[1:]) * _MIX) >> np.uint64(1)
            h12s.update((h12).tolist())
            h1s.update((h1 >> np.uint64(1)).tolist())
    assert len(h12s) == len(str_bigrams), "63-bit bigram-hash collision"
    assert len(h1s) == len(str_lefts), "63-bit left-token-hash collision"


def test_free_text_suggest_matches_brute(ray_session):
    """Stupid-backoff next-token suggestion vs a brute recomputation: bigram
    order C(ctx w)/C(ctx .), unigram backoff 0.4*C(w)/T excluding terms
    already suggested at bigram order, no-context queries at unigram order
    unpenalized; ranked (score desc, term asc)."""
    import re

    import ray.data as rd

    from lucene_solr_ray.stages.textstats import free_text_suggest

    texts = [
        "data scan data sort data scan merge",
        "the data the sort the scan",
        "sort merge join data dump",
        "scan scan dump the data dump",
    ]
    tbl = pa.table({"text": pa.array(texts)})
    queries = ["data s", "du", "the "]
    got = free_text_suggest(rd.from_arrow(tbl).repartition(3), queries, top=5)

    toks_by_doc = [[t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for s in texts]
    allt = [t for d in toks_by_doc for t in d]
    bigrams = [(d[i], d[i + 1]) for d in toks_by_doc for i in range(len(d) - 1)]
    T = float(len(allt))

    def brute(q, top=5):
        ql = q.lower()
        ends_mid = bool(re.search(r"[a-z0-9]$", ql))
        toks = [t for t in re.split(r"[^a-z0-9]+", ql) if t]
        prefix = toks[-1] if (ends_mid and toks) else ""
        ctx = (toks[-2] if len(toks) >= 2 else None) if ends_mid else (toks[-1] if toks else None)
        cands = {}
        if ctx is not None:
            c1 = sum(1 for a, _ in bigrams if a == ctx)
            if c1:
                for a, b in bigrams:
                    if a == ctx and b.startswith(prefix):
                        cands[b] = cands.get(b, 0) + 1
                cands = {t: c / c1 for t, c in cands.items()}
        for t in set(allt):
            if t.startswith(prefix) and t not in cands:
                s = allt.count(t) / T
                cands[t] = s if ctx is None else 0.4 * s
        ranked = sorted(cands.items(), key=lambda ts: (-ts[1], ts[0]))[:top]
        return [(q, r, t, round(s, 6)) for r, (t, s) in enumerate(ranked)]

    want = [row for q in queries for row in brute(q)]
    assert got == want
