"""Relational / training-data pipelines over the sf tables (driver contract).

Covers the reference's aggregation/join/grouping operator family (SURVEY.md
§2.4-2.5, §2.8-2.9) on the TPC-H-ish tables, plus the large-scale
training-data operations (dedup, signatures, text stats, windowed events,
ANN) over ``documents`` / ``embeddings`` / ``events``.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _docs(sf_dir, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---- dedup / signatures -----------------------------------------------------


def dedup_exact_docs(sf_dir: str) -> pa.Table:
    """Exact dedup by content hash; survivor = min doc_id per text."""
    from ..stages.dedup import exact_dedup

    out = exact_dedup(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return pa.table({"doc_id": sorted(out["doc_id"].astype("int64").tolist())})


def signature_md5_docs(sf_dir: str) -> pa.Table:
    """SignatureUpdateProcessor(MD5Signature) analog."""
    from ..stages.signatures import md5_signature_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(md5_signature_batch, batch_format="pyarrow", fn_kwargs={"fields": ["text"]})
        .select_columns(["doc_id", "signature"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({"doc_id": out["doc_id"].astype("int64").tolist(), "signature": out["signature"].tolist()})


def minhash_clusters_docs(sf_dir: str) -> pa.Table:
    """MinHash+LSH near-dup clusters (rows-only oracle: non-SQL)."""
    from ..stages.dedup import minhash_clusters

    out = minhash_clusters(_docs(sf_dir, ["doc_id", "text"]), rounds=None).to_pandas().sort_values("doc_id")
    return pa.table(
        {"doc_id": out["doc_id"].astype("int64").tolist(), "cluster_id": out["cluster_id"].astype("int64").tolist()}
    )


def simhash_pairs_docs(sf_dir: str) -> pa.Table:
    """SimHash near-dup candidate pairs, Hamming <= 3 (rows-only oracle)."""
    from ..stages.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    out = out.sort_values(["a", "b"]) if len(out) else out
    return pa.table(
        {
            "a": out["a"].astype("int64").tolist() if len(out) else [],
            "b": out["b"].astype("int64").tolist() if len(out) else [],
            "hamming": out["hamming"].astype("int64").tolist() if len(out) else [],
        }
    )


def ngram_jaccard_dups_docs(sf_dir: str) -> pa.Table:
    """EXACT token-3-gram Jaccard >= 0.5 similarity self-join, S-gated:
    prefix-filter candidate generation (AllPairs/PPJoin) + distributed exact
    verify; the DuckDB oracle recomputes all-pairs Jaccard from the same
    tokenization, so recall is provably 1.0 (round-3: replaces the
    probabilistic-recall SimHash candidate path in this entry)."""
    from ..stages.dedup import ssjoin_jaccard

    ds = _docs(sf_dir, ["doc_id", "text"])
    verified = ssjoin_jaccard(ds, threshold=0.5, n=3)
    verified.sort(key=lambda r: (r["a"], r["b"]))
    return pa.table(
        {
            "a": pa.array([r["a"] for r in verified], type=pa.int64()),
            "b": pa.array([r["b"] for r in verified], type=pa.int64()),
        }
    )


FRO_START, FRO_END, FRO_GAP = 50.0, 350.0, 50.0


def facet_range_other_events(sf_dir: str) -> pa.Table:
    """``facet.range`` with ``facet.range.include=all`` +
    ``facet.range.other=all`` (`solr/core/src/java/org/apache/solr/request/
    SimpleFacets.java` rangeCounts over `FacetParams.FacetRangeInclude/
    FacetRangeOther`): every bucket [lo, hi] is inclusive of BOTH edges
    (include=all's documented boundary double-count), plus the
    before (< start) / after (> end) / between (start <= v <= end) rows.
    Edge comparisons are exact float64 equality against shared constants —
    identical IEEE compares on engine and oracle, no hash hazard.

    Scale shape: per-batch combiner (one vectorized pass, 9 counters),
    driver merge bounded by n_rows_out x n_blocks."""
    los = np.arange(FRO_START, FRO_END, FRO_GAP)
    labels = [str(int(lo)) for lo in los] + ["before", "after", "between"]

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t["value"], dtype=np.float64)
        cnt = [int(((v >= lo) & (v <= lo + FRO_GAP)).sum()) for lo in los]
        cnt.append(int((v < FRO_START).sum()))
        cnt.append(int((v > FRO_END).sum()))
        cnt.append(int(((v >= FRO_START) & (v <= FRO_END)).sum()))
        return pa.table(
            {
                "ord": pa.array(range(len(labels)), type=pa.int64()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    total = np.zeros(len(labels), dtype=np.int64)
    np.add.at(total, parts["ord"].to_numpy(), parts["cnt"].to_numpy())
    return pa.table(
        {
            "ord": pa.array(range(len(labels)), type=pa.int64()),
            "bucket": pa.array(labels, type=pa.string()),
            "cnt": pa.array(total, type=pa.int64()),
        }
    )


def bigram_lm_docs(sf_dir: str) -> pa.Table:
    """Bigram conditional-LM quality score (`stages/textstats.py::
    bigram_lm_scores`): per-doc mean of ln(C(t1 t2)/C(t1 ·)) under the
    corpus bigram distribution — the KenLM-style step above the unigram
    entry.  S-gated with the same 6-decimal output contract; the oracle
    rebuilds both count tables with window functions."""
    from ..stages.textstats import bigram_lm_scores

    out = (
        bigram_lm_scores(_docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_bigrams": out["n_bigrams"].astype("int64").tolist(),
            "avg_logprob": pa.array(out["avg_logprob"].tolist(), type=pa.float64()),
        }
    )


def simhash_md5_pairs_docs(sf_dir: str) -> pa.Table:
    """SimHash near-dup pairs under the SQL gate (md5 bit family,
    `stages/dedup.py::simhash_md5_pairs`): banded with bands = hamming+1,
    so pigeonhole completeness makes the engine's banded pair set EQUAL to
    the all-pairs Hamming join the DuckDB oracle computes directly — the
    sign test is integer-exact (tf weights) on both sides."""
    from ..stages.dedup import simhash_md5_pairs

    out = (
        simhash_md5_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)
        .to_pandas()
        .sort_values(["a", "b"])
    )
    return pa.table(
        {
            "a": pa.array(out["a"].astype("int64").tolist(), type=pa.int64()),
            "b": pa.array(out["b"].astype("int64").tolist(), type=pa.int64()),
            "hamming": pa.array(out["hamming"].astype("int64").tolist(), type=pa.int64()),
        }
    )


def minhash_lsh_candidates_docs(sf_dir: str) -> pa.Table:
    """MinHash-LSH candidate pairs under the SQL gate: the md5-based hash
    family (`stages/dedup.py::minhash_md5_candidates`) is deterministic AND
    DuckDB-expressible, so the oracle replays the full
    shingle -> minhash -> band -> bucket pipeline and the probabilistic
    recall itself becomes part of the verified contract (the native
    vectorized family keeps the production path; rows-only
    `minhash_clusters_docs` still gates it end-to-end in pytest)."""
    from ..stages.dedup import minhash_md5_candidates

    pairs = minhash_md5_candidates(_docs(sf_dir, ["doc_id", "text"]))
    return pa.table(
        {
            "a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )


def minhash_md5_clusters_docs(sf_dir: str) -> pa.Table:
    """MinHash-LSH CLUSTERS under the SQL gate (cluster_id = min doc_id
    reachable through shared LSH buckets): the md5 candidate family of
    :func:`minhash_lsh_candidates_docs` feeds the distributed
    label-propagation components (`stages/dedup.py::pair_graph_clusters`,
    pointer-jumped, converged), and the DuckDB oracle replays the ENTIRE
    pipeline — shingle -> md5 minhash -> band buckets -> pair edges ->
    recursive-CTE transitive closure — so both the probabilistic candidate
    recall AND the component construction are hash-verified end-to-end."""
    from ..stages.dedup import minhash_md5_candidates, pair_graph_clusters

    pairs = minhash_md5_candidates(_docs(sf_dir, ["doc_id", "text"]))
    out = (
        pair_graph_clusters(
            [{"a": int(a), "b": int(b)} for a, b in pairs],
            _docs(sf_dir, ["doc_id"]),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype("int64").tolist(), type=pa.int64()),
            "cluster_id": pa.array(out["cluster_id"].astype("int64").tolist(), type=pa.int64()),
        }
    )


def jaccard_clusters_docs(sf_dir: str) -> pa.Table:
    """Connected components of the exact Jaccard>=0.5 pair graph (cluster_id
    = min doc_id of the component), S-gated against a recursive-CTE
    transitive closure in DuckDB — the driver-verifiable analog of the
    MinHash cluster contract (clusters closed under the pair relation)."""
    from ..stages.dedup import pair_graph_clusters, ssjoin_jaccard

    ds = _docs(sf_dir, ["doc_id", "text"])
    pairs = ssjoin_jaccard(ds, threshold=0.5, n=3)
    # distributed label propagation + singleton union — the driver never
    # holds a per-doc structure (round-4: replaces clusters_from_pairs)
    out = (
        pair_graph_clusters(pairs, _docs(sf_dir, ["doc_id"]))
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype("int64").tolist(), type=pa.int64()),
            "cluster_id": pa.array(out["cluster_id"].astype("int64").tolist(), type=pa.int64()),
        }
    )


# ---- text stats -------------------------------------------------------------


def token_counts_docs(sf_dir: str) -> pa.Table:
    from ..stages.textstats import token_count_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({"doc_id": out["doc_id"].astype("int64").tolist(), "n_tokens": out["n_tokens"].astype("int64").tolist()})


def quality_docs(sf_dir: str) -> pa.Table:
    """Quality scoring: ASCII-letter count, token count, alpha ratio."""
    from ..stages.textstats import quality_score_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(quality_score_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_alpha", "n_tokens", "alpha_ratio"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_alpha": out["n_alpha"].astype("int64").tolist(),
            "n_tokens": out["n_tokens"].astype("int64").tolist(),
            "alpha_ratio": out["alpha_ratio"].astype("float64").tolist(),
        }
    )


def unigram_lm_docs(sf_dir: str) -> pa.Table:
    """CCNet-style unigram LM quality score: per-doc average token
    log-probability under the corpus unigram distribution (one distributed
    ttf pass -> broadcast LM -> one scoring pass).  S-gated: the oracle
    recomputes the distribution and per-doc average in SQL; avg_logprob is
    rounded to 6 decimals in BOTH (the output contract)."""
    from ..stages.textstats import unigram_lm_scores

    out = (
        unigram_lm_scores(_docs(sf_dir, ["doc_id", "text"]))
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_tokens": out["n_tokens"].astype("int64").tolist(),
            "avg_logprob": out["avg_logprob"].astype("float64").tolist(),
        }
    )


def decontaminate_docs(sf_dir: str) -> pa.Table:
    """Eval-set decontamination: docs with ``doc_id % 7 == 0`` form the
    deterministic held-out set; every OTHER doc sharing an 8-token gram with
    it is flagged with its distinct contaminated-gram count.  S-gated: the
    oracle recomputes the gram join with window functions in SQL (the engine
    probes 64-bit gram hashes against one broadcast array — same distinct
    counts absent a 2^-64 collision, none in the fixed corpus)."""
    from ..stages.dedup import decontaminate

    def _part(is_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            m = (np.asarray(t["doc_id"], dtype=np.int64) % 7) == 0
            return t.filter(pa.array(m if is_eval else ~m))

        return f

    docs = _docs(sf_dir, ["doc_id", "text"])
    out = decontaminate(
        docs.map_batches(_part(False), batch_format="pyarrow"),
        docs.map_batches(_part(True), batch_format="pyarrow"),
        n=8,
    ).to_pandas()
    if len(out) == 0:  # all-empty blocks can lose the schema in to_pandas
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_contaminated_grams": pa.array([], type=pa.int64()),
            }
        )
    out = out.sort_values("doc_id")
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_contaminated_grams": out["n_contaminated_grams"].astype("int64").tolist(),
        }
    )


def dup_span_docs(sf_dir: str) -> pa.Table:
    """Exact-substring dedup (Lee et al. 2022 ExactSubstr over 8-token
    windows): every duplicated-gram occurrence except the canonical first —
    the corpus-wide spans a training pipeline would cut.  S-gated against
    the full window-function recomputation in SQL."""
    from ..stages.dedup import duplicate_ngram_spans

    out = (
        duplicate_ngram_spans(_docs(sf_dir, ["doc_id", "text"]), window=8)
        .to_pandas()
        .sort_values(["doc_id", "pos", "gram"])
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "pos": out["pos"].astype("int64").tolist(),
            "gram": out["gram"].tolist(),
        }
    )


def pii_scrub_docs(sf_dir: str) -> pa.Table:
    """PII scrub (emails/IPv4/phone-like) over documents augmented with
    deterministic synthetic contact lines (the fixture corpus is letter-only,
    so the entry plants PII derived from doc_id in BOTH engine and oracle —
    the scrub itself is the production kernel, vectorized RE2)."""
    import pyarrow.compute as pc

    from ..stages.textstats import pii_scrub_batch

    def augment(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = pc.cast(t["doc_id"], pa.string())
        mod = pa.array(
            (np.asarray(t["doc_id"], dtype=np.int64) % 256).astype(str)
        )
        txt = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""),
            " contact user", ids, "@example.com at 10.0.0.", mod,
            " tel +1 555 000 ", ids, " end",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(augment, batch_format="pyarrow")
        .map_batches(pii_scrub_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "scrubbed", "n_pii"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "scrubbed": out["scrubbed"].tolist(),
            "n_pii": out["n_pii"].astype("int64").tolist(),
        }
    )


def repetition_docs(sf_dir: str) -> pa.Table:
    """Gopher-style repetition quality signals (duplicate-trigram fraction +
    top-bigram occurrence count) per document — the within-doc counterpart of
    the corpus-level dedup family, used to drop boilerplate from LLM training
    corpora."""
    from ..stages.textstats import repetition_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(repetition_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_trigrams", "n_dup_trigrams", "dup_trigram_frac", "top_bigram_n"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_trigrams": out["n_trigrams"].astype("int64").tolist(),
            "n_dup_trigrams": out["n_dup_trigrams"].astype("int64").tolist(),
            "dup_trigram_frac": out["dup_trigram_frac"].astype("float64").tolist(),
            "top_bigram_n": out["top_bigram_n"].astype("int64").tolist(),
        }
    )


def stopword_docs(sf_dir: str) -> pa.Table:
    """Stopword-ratio quality signal (the classic CCNet/Gopher language-
    quality heuristic): count of Lucene's 33 English stopwords
    (`StopAnalyzer.ENGLISH_STOP_WORDS_SET`) over the simple tokenization,
    plus the ratio."""
    from ..stages.textstats import stopword_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stopword_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_stopwords", "n_tokens", "stop_ratio"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_stopwords": out["n_stopwords"].astype("int64").tolist(),
            "n_tokens": out["n_tokens"].astype("int64").tolist(),
            "stop_ratio": out["stop_ratio"].astype("float64").tolist(),
        }
    )


def langid_docs(sf_dir: str) -> pa.Table:
    """LanguageIdentifierUpdateProcessor analog (rows-only oracle)."""
    from ..stages.textstats import LanguageId

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(LanguageId, batch_format="pyarrow", concurrency=2)
        .select_columns(["doc_id", "lang_pred"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table({"doc_id": out["doc_id"].astype("int64").tolist(), "lang_pred": out["lang_pred"].tolist()})


def fingerprint_docs(sf_dir: str) -> pa.Table:
    """Document fingerprints under the SQL gate: md5 hex of the
    ``\\x1f``-joined simple-token stream (order-sensitive, whitespace/punct
    insensitive — the same normalized string the production 64-bit
    polynomial family hashes in ``fingerprint_batch``, which stays the
    at-scale path with its P gates; md5 is the replayability price, same
    trade as the signature/minhash md5 families)."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(pc.fill_null(t["text"].combine_chunks(), ""))
        norm = pc.replace_substring_regex(lower, "[^a-z0-9]+", "\x1f")
        norm = pc.replace_substring_regex(norm, "^\x1f|\x1f$", "")
        sigs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm.to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint_md5": pa.array(sigs, type=pa.string()),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "fingerprint_md5": out["fingerprint_md5"].tolist(),
        }
    )


def bpe_token_counts_docs(sf_dir: str) -> pa.Table:
    """BPE-ish pre-tokenizer token counts (training-cost estimator)."""
    from ..stages.textstats import bpe_token_count_batch

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bpe_token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_bpe_tokens"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "n_bpe_tokens": out["n_bpe_tokens"].astype("int64").tolist(),
        }
    )


def ord_rord_docs(sf_dir: str) -> pa.Table:
    """ord/rord value sources (`ValueSourceParser.java:97,129`): per doc,
    the ordinal of its ``lang`` value in the sorted dictionary and the
    reverse ordinal — served straight from the docmap ordinal column."""
    from ..index.reader import GlobalStats, IndexPartition
    from ..pipelines.fulltext import documents_index

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    n_vals = len(stats.dicts["lang"])
    rows = {"doc_id": [], "ord_lang": [], "rord_lang": []}
    for p in stats.manifest["partitions"]:
        part = IndexPartition(ix, p["partition_id"], stats)
        ords = part.columns["lang_ord"].astype(np.int64)
        rows["doc_id"].extend(part.doc_ids.tolist())
        rows["ord_lang"].extend(ords.tolist())
        rows["rord_lang"].extend((n_vals - 1 - ords).tolist())
    order = np.argsort(np.asarray(rows["doc_id"]))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(rows["doc_id"])[order], type=pa.int64()),
            "ord_lang": pa.array(np.asarray(rows["ord_lang"])[order], type=pa.int64()),
            "rord_lang": pa.array(np.asarray(rows["rord_lang"])[order], type=pa.int64()),
        }
    )


# ---- ANN --------------------------------------------------------------------


def _query_vectors(sf_dir: str, n: int = 5) -> np.ndarray:
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).take(n)
    return np.asarray([r["embedding"] for r in emb], dtype=np.float32)


def _ann_rows_table(rows) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in rows], type=pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], type=pa.int64()),
        }
    )


def ann_brute_topk(sf_dir: str) -> pa.Table:
    """Exact cosine top-10 for 5 query vectors, S-gated: the DuckDB oracle
    recomputes all-pairs ``list_cosine_similarity`` with the same (score
    desc, vec_id asc) tie-break (round 3: was rows-only)."""
    from ..stages.ann import brute_force_topk

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return _ann_rows_table(brute_force_topk(emb, _query_vectors(sf_dir), k=10))


def ann_ivf_full_probe(sf_dir: str) -> pa.Table:
    """IVF with nprobe = n_clusters MUST equal exact brute force — gates the
    whole IVF machinery (k-means, assignment, probe masks, merge) under the
    same SQL cosine oracle as ``ann_brute_topk``."""
    from ..stages.ann import ivf_topk

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = ivf_topk(emb, _query_vectors(sf_dir), k=10, n_clusters=16, nprobe=16)
    return _ann_rows_table(rows)


def ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF (nprobe=4/16) approximate cosine top-10 (rows-only oracle; recall
    vs brute is the pytest gate — approximation is the semantics)."""
    from ..stages.ann import ivf_topk

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = ivf_topk(emb, _query_vectors(sf_dir), k=10, n_clusters=16, nprobe=4)
    return _ann_rows_table(rows)


EMB_DUP_THRESHOLD = 0.4632  # centered in a cosine gap common to sf0.001
# and sf0.01 (margins >= 3e-3 both sides; asserted in test_dedup_ann.py)


def embedding_dup_pairs_brute(sf_dir: str) -> pa.Table:
    """Exact cosine threshold self-join over the embeddings table, S-gated:
    every (a < b) pair with cos >= the threshold, integer ids only (no
    float crosses the hash gate; the threshold sits >= 3e-3 from any
    fixture pair's cosine at both gate scales, asserted in pytest).  This is the ground-truth member of the
    embedding near-dup family — the LSH entry approximates it at scale."""
    from ..stages.ann import brute_dup_pairs

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return brute_dup_pairs(emb, threshold=EMB_DUP_THRESHOLD)


def embedding_near_dup_docs(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs (random-hyperplane LSH candidates +
    exact cosine verify; rows-only).  The synthetic embeddings table has no
    natural near-dups (max pairwise cosine ~0.51), so 20 deterministic
    perturbed copies are planted (ids 10_000_000+i duplicating vec i) — the
    operator must recover exactly those plants."""
    from ..stages.ann import embedding_near_dup_pairs

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        take = ids < 20
        if not take.any():
            return t
        src = t.filter(pa.array(take))
        vecs = np.asarray(src["embedding"].to_pylist(), dtype=np.float32)
        # noise seeded PER VEC ID, so the planted copies are identical under
        # any Ray block layout (a per-batch rng would assign noise rows by
        # within-batch order and change with the block split)
        noise = np.stack(
            [
                np.random.default_rng(99 + int(i))
                .standard_normal(vecs.shape[1])
                .astype(np.float32)
                for i in np.asarray(src["vec_id"], dtype=np.int64)
            ]
        )
        vecs = vecs + 0.01 * noise
        base = t.select(["vec_id", "embedding"])
        dup = pa.table(
            {
                "vec_id": pa.array(
                    np.asarray(src["vec_id"], dtype=np.int64) + 10_000_000,
                    type=base.schema.field("vec_id").type,
                ),
                "embedding": pa.array([v.tolist() for v in vecs]).cast(
                    base.schema.field("embedding").type
                ),
            }
        )
        return pa.concat_tables([base, dup])

    planted = emb.select_columns(["vec_id", "embedding"]).map_batches(plant, batch_format="pyarrow")
    rows = embedding_near_dup_pairs(planted, threshold=0.95)
    rows.sort(key=lambda r: (r["a"], r["b"]))
    return pa.table(
        {
            "a": pa.array([r["a"] for r in rows], type=pa.int64()),
            "b": pa.array([r["b"] for r in rows], type=pa.int64()),
            "cosine": pa.array([round(r["cosine"], 4) for r in rows], type=pa.float64()),
        }
    )


# ---- events (windowed aggregate) --------------------------------------------


def events_sliding_counts(sf_dir: str) -> pa.Table:
    """Hopping (sliding) window: 1-hour windows every 15 minutes, events per
    (event_type, window_start).  Each event lands in up to 4 windows — a
    vectorized flat-map (numpy repeat over hop offsets) then one groupby;
    the streaming-window family's third member next to tumbling + session."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"])
    HOP_US = 15 * 60 * 1_000_000
    WIN_US = 60 * 60 * 1_000_000
    K = WIN_US // HOP_US  # windows per event

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        us = np.asarray(pc.cast(t["ts"], pa.int64()))  # epoch micros
        # last hop-aligned start <= ts, then the K-1 earlier hops that still
        # cover ts (window_start > ts - WIN)
        last = (us // HOP_US) * HOP_US
        starts = last[:, None] - np.arange(K, dtype=np.int64)[None, :] * HOP_US
        keep = starts > (us[:, None] - WIN_US)
        ev = np.repeat(np.arange(len(us), dtype=np.int64), K)[keep.ravel()]
        ws = starts.ravel()[keep.ravel()]
        return pa.table(
            {
                "event_type": t["event_type"].take(pa.array(ev)),
                "window_start": pa.array(ws, type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
    )
    import pandas as pd

    return pa.table(
        {
            "event_type": out["event_type"].tolist(),
            "window_start": pa.array(
                pd.to_datetime(out["window_start"].astype("int64"), unit="us"),
                type=pa.timestamp("us"),
            ),
            "n": out["n"].astype("int64").tolist(),
        }
    )


def events_hourly_counts(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour window: events per (event_type, hour)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"])

    def to_hour(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "hour": pc.floor_temporal(t["ts"], unit="hour")})

    out = (
        ds.map_batches(to_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "hour"])
    )
    return pa.table(
        {
            "event_type": out["event_type"].tolist(),
            "hour": pa.array(out["hour"].tolist(), type=pa.timestamp("us")),
            "n": out["n"].astype("int64").tolist(),
        }
    )


def session_windows_events(sf_dir: str) -> pa.Table:
    """Session-window aggregate (the streaming-window family beyond tumbling
    windows): per user, events within 30-minute gaps form one session.
    One bucketed shuffle on user_id; sessionization is vectorized inside
    each bucket (lexsort + gap boundaries + segmented reductions).
    Output: one row per session (user_id, session_start, n_events)."""
    from ..hashing import with_bucket

    GAP_US = 30 * 60 * 1_000_000

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def sessions(group: pa.Table) -> pa.Table:
        uid = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(pc.cast(group["ts"], pa.int64()))
        order = np.lexsort((ts, uid))
        u_s, t_s = uid[order], ts[order]
        new = np.ones(len(u_s), dtype=bool)
        new[1:] = (u_s[1:] != u_s[:-1]) | (t_s[1:] - t_s[:-1] > GAP_US)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(u_s)))
        return pa.table(
            {
                "user_id": pa.array(u_s[starts], type=pa.int64()),
                "session_start": pa.array(t_s[starts], type=pa.timestamp("us")),
                "n_events": pa.array(counts, type=pa.int64()),
            }
        )

    out = (
        ds.map_batches(with_bucket("user_id", 32), batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: sessions(g.drop_columns(["__b"])), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["user_id", "session_start"])
    )
    return pa.table(
        {
            "user_id": out["user_id"].astype("int64").tolist(),
            "session_start": pa.array(out["session_start"].tolist(), type=pa.timestamp("us")),
            "n_events": out["n_events"].astype("int64").tolist(),
        }
    )


def facet_range_events_datemath(sf_dir: str) -> pa.Table:
    """Date-math range facet (`DateMathParser.java` + ``facet.range``):
    start/end from date-math expressions (calendar rounding + offsets), fixed
    +7DAYS gap, ALL buckets emitted including empty ones.  Vectorized:
    timestamp->int64 searchsorted against the bucket edges, partial counts
    pre-aggregated per batch, one tiny groupby-sum."""
    from datetime import datetime, timedelta

    from ..functions.datemath import parse_datemath

    start = parse_datemath("2023-12-15T10:30:00Z/MONTH+2DAYS")
    end = parse_datemath("2024-02-15T00:00:00Z/MONTH")
    gap = timedelta(days=7)
    edges = []
    e = start
    while e < end:
        edges.append(e)
        e = e + gap
    epoch = datetime(1970, 1, 1)
    edges_us = np.array([int((x - epoch).total_seconds() * 1e6) for x in edges], dtype=np.int64)
    gap_us = np.int64(gap.total_seconds() * 1e6)

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def count_batch(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(t["ts"], pa.int64()))
        idx = np.searchsorted(edges_us, ts, side="right") - 1
        ok = (idx >= 0) & (ts - edges_us[np.maximum(idx, 0)] < gap_us)
        counts = np.bincount(idx[ok], minlength=len(edges)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(len(edges), dtype=np.int64), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(count_batch, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    full = np.zeros(len(edges), dtype=np.int64)
    full[agg["bucket"].to_numpy()] = agg["n"].to_numpy()
    return pa.table(
        {
            "bucket_start": pa.array(edges, type=pa.timestamp("us")),
            "n": pa.array(full, type=pa.int64()),
        }
    )


def interval_facets_quantity(sf_dir: str) -> pa.Table:
    """IntervalFacets analog (`solr/core/src/java/org/apache/solr/request/
    IntervalFacets.java`): arbitrary [a,b) / (a,b] intervals over a numeric
    doc-values column, one count per interval, intervals may overlap."""
    from ..functions.datemath import parse_interval

    specs = ["[1,10)", "[10,25)", "[25,45]", "(45,*]"]
    parsed = [parse_interval(s) for s in specs]
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_quantity"])

    def count_batch(t: pa.Table) -> pa.Table:
        v = np.asarray(t["l_quantity"], dtype=np.float64)
        counts = []
        for lo, hi, ilo, ihi in parsed:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= (v >= lo) if ilo else (v > lo)
            if hi is not None:
                m &= (v <= hi) if ihi else (v < hi)
            counts.append(int(m.sum()))
        return pa.table(
            {
                "iv": pa.array(np.arange(len(specs), dtype=np.int64), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(count_batch, batch_format="pyarrow")
        .groupby("iv")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("iv")
    )
    return pa.table(
        {
            "iv": pa.array(agg["iv"].astype("int64").tolist(), type=pa.int64()),
            "interval": pa.array([specs[i] for i in agg["iv"]], type=pa.string()),
            "n": pa.array(agg["n"].astype("int64").tolist(), type=pa.int64()),
        }
    )


def stats_facet_price_by_priority(sf_dir: str) -> pa.Table:
    """Per-facet-bucket stats + exact countDistinct (StatsComponent
    ``stats.facet`` + ``countDistinct``, `StatsValuesFactory.java:84-302`):
    o_totalprice stats per o_orderpriority plus distinct o_custkey count.
    countDistinct = per-batch Arrow distinct (combiner) -> pair shuffle ->
    per-bucket count — never a driver value set.

    sum/mean contract is defined in EXACT integer-cents space on both the
    engine and oracle sides (the ``stats_full_nchars`` pattern): float64
    partial sums reduce in nondeterministic batch order under Ray, so the
    distributed ``Sum(double)`` is not reproducible to the last ulp.  Integer
    sums are associative-exact; one float division at the end is performed by
    the identical formula in the SQL oracle (``sum_cents/100.0`` and
    ``sum_cents/100.0/cnt``)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice", "o_custkey"],
    )

    def with_cents(t: pa.Table) -> pa.Table:
        v = np.asarray(t["o_totalprice"], dtype=np.float64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return t.append_column("cents", pa.array(cents, type=pa.int64()))

    base = (
        ds.map_batches(with_cents, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Min("o_totalprice", alias_name="min_p"),
            Max("o_totalprice", alias_name="max_p"),
            Sum("cents", alias_name="sum_c"),
            Count(alias_name="cnt"),
        )
        .to_pandas()
    )
    base["sum_p"] = base["sum_c"].astype("int64") / 100.0
    base["mean_p"] = base["sum_p"] / base["cnt"].astype("int64")

    def uniq_pairs(t: pa.Table) -> pa.Table:
        return (
            t.select(["o_orderpriority", "o_custkey"])
            .group_by(["o_orderpriority", "o_custkey"])
            .aggregate([])
        )

    dpairs = (
        ds.map_batches(uniq_pairs, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_custkey"])
        .aggregate(Count(alias_name="_c"))
    )
    dcount = (
        dpairs.map_batches(
            lambda t: t.select(["o_orderpriority"]), batch_format="pyarrow"
        )
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_cust"))
        .to_pandas()
    )
    out = base.merge(dcount, on="o_orderpriority").sort_values("o_orderpriority")
    return pa.table(
        {
            "o_orderpriority": out["o_orderpriority"].tolist(),
            "min_p": out["min_p"].astype("float64").tolist(),
            "max_p": out["max_p"].astype("float64").tolist(),
            "sum_p": out["sum_p"].astype("float64").tolist(),
            "cnt": out["cnt"].astype("int64").tolist(),
            "mean_p": out["mean_p"].astype("float64").tolist(),
            "n_cust": out["n_cust"].astype("int64").tolist(),
        }
    )


def cardinality_custkey_hll(sf_dir: str) -> pa.Table:
    """Approximate cardinality via HyperLogLog (StatsComponent
    ``cardinality``): per-batch register partials, elementwise-max merge —
    only (2^p)-byte arrays leave the workers (rows-only oracle; accuracy is
    pytest-gated)."""
    from ..state.hll import HyperLogLog

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        h = HyperLogLog(12).add_ints(np.asarray(t["o_custkey"]))
        return pa.table({"registers": pa.array([h.registers.tobytes()], type=pa.binary())})

    acc = HyperLogLog(12)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc.merge(HyperLogLog(12, np.frombuffer(r["registers"], np.uint8).copy()))
    return pa.table(
        {"field": pa.array(["o_custkey"]), "estimate": pa.array([acc.estimate()], type=pa.float64())}
    )


# ---- grouping / joins (TPC-H-ish) -------------------------------------------


def _orders_ds(sf_dir: str):
    return rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )


def group_top1_orders(sf_dir: str) -> pa.Table:
    """Grouping/collapse analog: best order per customer
    (o_totalprice desc, o_orderkey asc tie-break)."""
    from ..stages.grouping import grouped_topk

    out = (
        grouped_topk(_orders_ds(sf_dir), "o_custkey", "o_totalprice", "o_orderkey", 1)
        .to_pandas()
        .sort_values("o_custkey")
    )
    return pa.table(
        {
            "o_custkey": out["o_custkey"].astype("int64").tolist(),
            "o_orderkey": out["o_orderkey"].astype("int64").tolist(),
            "o_totalprice": out["o_totalprice"].astype("float64").tolist(),
        }
    )


def group_topk_orders(sf_dir: str) -> pa.Table:
    """Grouping with top-k per group (TermSecondPassGroupingCollector):
    top-3 orders per customer by (o_totalprice desc, o_orderkey asc)."""
    from ..stages.grouping import grouped_topk

    out = (
        grouped_topk(_orders_ds(sf_dir), "o_custkey", "o_totalprice", "o_orderkey", 3)
        .to_pandas()
        .sort_values(["o_custkey", "rk"])
    )
    return pa.table(
        {
            "o_custkey": out["o_custkey"].astype("int64").tolist(),
            "rk": out["rk"].astype("int64").tolist(),
            "o_orderkey": out["o_orderkey"].astype("int64").tolist(),
            "o_totalprice": out["o_totalprice"].astype("float64").tolist(),
        }
    )


def expand_orders(sf_dir: str) -> pa.Table:
    """ExpandComponent analog: the collapse keeps each group's head (rank 0);
    expand returns the next 2 rows per group (ranks 1-2) in group order."""
    from ..stages.grouping import grouped_topk

    out = (
        grouped_topk(_orders_ds(sf_dir), "o_custkey", "o_totalprice", "o_orderkey", 3, min_rank=1)
        .to_pandas()
        .sort_values(["o_custkey", "rk"])
    )
    return pa.table(
        {
            "o_custkey": out["o_custkey"].astype("int64").tolist(),
            "rk": out["rk"].astype("int64").tolist(),
            "o_orderkey": out["o_orderkey"].astype("int64").tolist(),
            "o_totalprice": out["o_totalprice"].astype("float64").tolist(),
        }
    )


def semi_join_customers(sf_dir: str) -> pa.Table:
    """JoinQParserPlugin analog: customers having an order > 150000
    (broadcast semi-join: key set via ray.put, filter in map_batches)."""
    from ..stages.joins import broadcast_semi_join

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"])
    keys = set(
        r["o_custkey"]
        for r in orders.map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], 150000.0)).select(["o_custkey"]),
            batch_format="pyarrow",
        ).take_all()
    )
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"])
    out = broadcast_semi_join(cust, keys, "c_custkey").to_pandas().sort_values("c_custkey")
    return pa.table({"c_custkey": out["c_custkey"].astype("int64").tolist(), "c_name": out["c_name"].tolist()})


def block_join_orders(sf_dir: str) -> pa.Table:
    """Block-join analog (ToParentBlockJoinQuery max/count): per URGENT order,
    child lineitem count and max extended price."""
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_extendedprice"])
    child = li.groupby("l_orderkey").aggregate(
        Count(alias_name="n_items"), Max("l_extendedprice", alias_name="max_price")
    )
    from ..stages.joins import broadcast_semi_join

    urgent = set(
        r["o_orderkey"]
        for r in rd.read_parquet(os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_orderkey"]),
            batch_format="pyarrow",
        )
        .take_all()
    )
    out = broadcast_semi_join(child, urgent, "l_orderkey").to_pandas().sort_values("l_orderkey")
    return pa.table(
        {
            "o_orderkey": out["l_orderkey"].astype("int64").tolist(),
            "n_items": out["n_items"].astype("int64").tolist(),
            "max_price": out["max_price"].astype("float64").tolist(),
        }
    )


def block_join_children(sf_dir: str) -> pa.Table:
    """CHILD-side block join (`ToChildBlockJoinQuery.java:1-60` semantics,
    round-3 verdict gap #2): return the child lineitem rows whose PARENT
    order matches the parent query (priority 1-URGENT AND totalprice >
    150000).  The parent filter is pushed into the pruned parent scan;
    the matched parent key set ships once via the broadcast semi-join
    (``partitioned_anti_join``'s bucketed shape is the documented regime
    above the broadcast threshold, same dispatch as uniqueKey dedup)."""
    from ..stages.joins import broadcast_semi_join

    parents = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    keys = set(
        r["o_orderkey"]
        for r in parents.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.equal(t["o_orderpriority"], "1-URGENT"),
                    pc.greater(t["o_totalprice"], 150000.0),
                )
            ).select(["o_orderkey"]),
            batch_format="pyarrow",
        ).take_all()
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem, so
    # the sort includes every output column — any remaining ties are
    # full-row duplicates, which hash identically in any order
    out = (
        broadcast_semi_join(li, keys, "l_orderkey")
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber", "l_extendedprice"])
    )
    return pa.table(
        {
            "l_orderkey": out["l_orderkey"].astype("int64").tolist(),
            "l_linenumber": out["l_linenumber"].astype("int64").tolist(),
            "l_extendedprice": out["l_extendedprice"].astype("float64").tolist(),
        }
    )


def export_sorted_lineitem(sf_dir: str) -> pa.Table:
    """SortingResponseWriter / ExportQParserPlugin analog: stream-export an
    entire filtered result set in full sort order (no paging) — a real
    distributed ``Dataset.sort``; rank column pins the order for the oracle."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45.0)), batch_format="pyarrow"
    )
    # l_quantity joins the sort so rows tying on all three logical keys
    # (possible in the synthetic lineitem — see block_join_children's note)
    # still order deterministically on every emitted column, engine and
    # oracle alike (the driver hash-compares row order)
    out = ds.sort(["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"]).to_pandas()
    return pa.table(
        {
            "rank": pa.array(range(len(out)), type=pa.int64()),
            "l_orderkey": out["l_orderkey"].astype("int64").tolist(),
            "l_linenumber": out["l_linenumber"].astype("int64").tolist(),
            "l_quantity": out["l_quantity"].astype("float64").tolist(),
        }
    )


def hash_join_orders_customer(sf_dir: str) -> pa.Table:
    """Partitioned hash join (both sides large): orders x customer on
    custkey, high-value orders only."""
    from ..stages.joins import hash_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"])
    out = hash_join(orders, cust, "o_custkey", "c_custkey", buckets=16).to_pandas()
    out = out.sort_values("o_orderkey")
    return pa.table(
        {
            "o_orderkey": out["o_orderkey"].astype("int64").tolist(),
            "c_name": out["c_name"].tolist(),
            "o_totalprice": out["o_totalprice"].astype("float64").tolist(),
        }
    )


def function_query_part(sf_dir: str) -> pa.Table:
    """ValueSource scalar-function surface: sqrt/abs/floor over part prices."""
    ds = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"])

    def fns(t: pa.Table) -> pa.Table:
        price = pc.cast(t["p_retailprice"], pa.float64())
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "sqrt_price": pc.sqrt(price),
                "abs_shift": pc.abs(pc.subtract(price, 1000.0)),
                "floor_div": pc.floor(pc.divide(price, 100.0)),
            }
        )

    out = ds.map_batches(fns, batch_format="pyarrow").to_pandas().sort_values("p_partkey")
    return pa.table(
        {
            "p_partkey": out["p_partkey"].astype("int64").tolist(),
            "sqrt_price": out["sqrt_price"].astype("float64").tolist(),
            "abs_shift": out["abs_shift"].astype("float64").tolist(),
            "floor_div": out["floor_div"].astype("float64").tolist(),
        }
    )


def update_processors_docs(sf_dir: str) -> pa.Table:
    """UpdateRequestProcessorChain end-to-end: truncate + regex-replace +
    field-length + concat + default-value composed through ingest_chain,
    checked against the equivalent DuckDB expressions."""
    from ..functions.registry import ingest_chain

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source"])
    out_ds = ingest_chain(
        ds,
        [
            ("truncate_field", {"field": "text", "max_length": 40}),
            ("regex_replace", {"field": "text", "pattern": "[0-9]+", "replacement": "#", "out": "no_digits"}),
            ("field_length", {"field": "no_digits", "out": "nd_len"}),
            ("concat_fields", {"fields": ("lang", "source"), "out": "lang_source", "sep": "|"}),
        ],
    )
    out = (
        out_ds.select_columns(["doc_id", "text", "nd_len", "lang_source"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "text": out["text"].tolist(),
            "nd_len": out["nd_len"].astype("int64").tolist(),
            "lang_source": out["lang_source"].tolist(),
        }
    )


def strdist_customers(sf_dir: str) -> pa.Table:
    """strdist value source (`ValueSourceParser.java:359`): edit distance of
    every c_name to a fixed target, whole-column vectorized DP."""
    from ..functions.valuesources import levenshtein_to

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"])

    def dist(t: pa.Table) -> pa.Table:
        d = levenshtein_to(t["c_name"], "Customer#000000500")
        return pa.table({"c_custkey": t["c_custkey"], "dist": pa.array(d, type=pa.int64())})

    out = ds.map_batches(dist, batch_format="pyarrow").to_pandas().sort_values("c_custkey")
    return pa.table(
        {
            "c_custkey": out["c_custkey"].astype("int64").tolist(),
            "dist": out["dist"].astype("int64").tolist(),
        }
    )


def function_query_events_ms(sf_dir: str) -> pa.Table:
    """ms value source (`ValueSourceParser.java:574`): milliseconds between
    each event timestamp and a fixed anchor instant."""
    from ..functions.valuesources import ms_between

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "ms_diff": ms_between(t["ts"], "2024-01-15T00:00:00Z")}
        )

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("event_id")
    return pa.table(
        {
            "event_id": out["event_id"].astype("int64").tolist(),
            "ms_diff": out["ms_diff"].astype("int64").tolist(),
        }
    )


def joindf_docs(sf_dir: str) -> pa.Table:
    """joindf value source (`JoinDocFreqValueSource.java`): per doc, the
    docfreq of its ``lang`` value as a term in the text field — a broadcast
    value->df dictionary lookup, vectorized per batch."""
    from ..functions.valuesources import joindf_lookup
    from ..index.reader import GlobalStats
    from ..pipelines.fulltext import documents_index

    ix = documents_index(sf_dir)
    stats = GlobalStats(ix)
    vals = list(stats.dicts["lang"])
    df_map = {v: stats.df.get(v, 0) for v in vals}
    fn = joindf_lookup(df_map)
    out = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(fn, batch_format="pyarrow", fn_kwargs={"value_col": "lang"})
        .select_columns(["doc_id", "joindf"])
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.table(
        {
            "doc_id": out["doc_id"].astype("int64").tolist(),
            "joindf": out["joindf"].astype("int64").tolist(),
        }
    )


def multimodal_frames(sf_dir: str) -> pa.Table:
    """Video frame-sampling plumbing (actor pool, flat_map shape: one row per
    sampled frame) over synthetic payloads; fake codec, rows-only oracle."""
    from ..stages.multimodal import FrameSampler

    def to_payload(t: pa.Table) -> pa.Table:
        payloads = [
            hashlib.blake2b((x or "").encode(), digest_size=32).digest() * 16
            for x in t["text"].to_pylist()
        ]
        return pa.table({"item_id": t["doc_id"], "payload": pa.array(payloads, type=pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    out = (
        ds.map_batches(
            FrameSampler,
            fn_constructor_kwargs={"fake": True, "every_n": 5, "max_frames": 3},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["item_id", "frame_no"])
    )
    return pa.table(
        {
            "item_id": out["item_id"].astype("int64").tolist(),
            "frame_no": out["frame_no"].astype("int64").tolist(),
            "payload_len": pa.array([len(p) for p in out["payload"]], type=pa.int64()),
        }
    )


def multimodal_decode(sf_dir: str) -> pa.Table:
    """Actor-pool binary-decode plumbing over synthetic payloads derived
    deterministically from documents (fake codec; rows-only oracle)."""
    from ..stages.multimodal import ImageDecoder

    def to_payload(t: pa.Table) -> pa.Table:
        payloads = [
            hashlib.blake2b((x or "").encode(), digest_size=32).digest() * 8
            for x in t["text"].to_pylist()
        ]
        return pa.table({"item_id": t["doc_id"], "payload": pa.array(payloads, type=pa.binary())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    out = ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    ).to_pandas().sort_values("item_id")
    feat_dim = pa.array([len(f) for f in out["features"]], type=pa.int64())
    return pa.table({"item_id": out["item_id"].astype("int64").tolist(), "feat_dim": feat_dim})


GEO_RADIUS_KM = 2000.0


def _synthetic_latlon_tenths(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic coordinates in integer TENTHS of a degree
    (ilat tenths above -90, ilon tenths above -180) derived from a key
    column — the one formula every spatial entry and its DuckDB oracle
    share (``(key*7) % 1800`` / ``(key*13) % 3600``)."""
    return (keys * 7) % 1800, (keys * 13) % 3600


def _synthetic_latlon(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Float degrees form of :func:`_synthetic_latlon_tenths`."""
    ilat, ilon = _synthetic_latlon_tenths(keys)
    return ilat / 10.0 - 90.0, ilon / 10.0 - 180.0


def geofilt_customers(sf_dir: str) -> pa.Table:
    """Spatial radius filter (``{!geofilt pt=0,0 sfield=latlon d=2000}``,
    `solr/core/src/java/org/apache/solr/schema/LatLonType.java`
    SpatialDistanceQuery + `solr/core/src/java/org/apache/solr/search/
    function/distance/HaversineConstFunction.java`): the TPC-H-ish tables
    carry no coordinates, so each customer gets a DETERMINISTIC synthetic
    0.1-degree-grid point derived from its key (same arithmetic in the SQL
    oracle), and the filter keeps keys whose great-circle distance from the
    origin is under the radius.  Output is integer keys only — the float
    distance never crosses the engine/oracle hash compare; the grid
    quantization keeps every point hundreds of km of margin away from any
    float disagreement at the radius boundary (asserted in pytest).

    Scale shape: stateless vectorized ``map_batches`` filter (numpy
    haversine), no shuffle, no driver state."""
    from ..functions.valuesources import geodist_km

    def keep(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        lat, lon = _synthetic_latlon(keys)
        d = np.asarray(geodist_km(lat, lon, 0.0, 0.0))
        return t.filter(pa.array(d < GEO_RADIUS_KM))

    out = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {"c_custkey": sorted(out["c_custkey"].astype("int64").tolist())}
    )


BBOX_PT = (20.0, 30.0)  # pt=20,30


def bbox_customers(sf_dir: str) -> pa.Table:
    """Spatial bounding-box filter (``{!bbox pt=20,30 sfield=latlon
    d=2000}``, `solr/core/src/java/org/apache/solr/schema/BBoxField.java` /
    `SpatialUtils.calcBoxByDistFromPt`): same deterministic synthetic
    0.1-degree-grid points as :func:`geofilt_customers`, but the filter is
    the rectangular box computed by ``calc_bbox_deg`` — a superset of the
    geofilt circle (corners of the box lie outside the radius), which is
    exactly the reference's bbox-vs-geofilt distinction.  The four bounds
    are query-time CONSTANTS; both the engine and the SQL oracle compare
    the identical synthetic coordinates against the identical literals, so
    the hash gate is float-safe by construction.

    Scale shape: stateless vectorized ``map_batches`` filter, no shuffle,
    no driver state."""
    from ..functions.valuesources import calc_bbox_deg

    lat_min, lat_max, lon_min, lon_max = calc_bbox_deg(*BBOX_PT, GEO_RADIUS_KM)
    assert lon_min <= lon_max  # pt/d chosen away from the dateline

    def keep(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        lat, lon = _synthetic_latlon(keys)
        m = (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
        return t.filter(pa.array(m))

    out = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table({"c_custkey": sorted(out["c_custkey"].astype("int64").tolist())})


# CCW convex pentagon in the (x=lon, y=lat) plane; .05-offset vertices keep
# every 0.1-grid synthetic point >= 0.6 degrees off any edge LINE (margin
# asserted in tests), so the >=0 half-plane decision is float-safe across
# engine and oracle
RPT_POLY = [(-25.05, -40.05), (-15.05, 30.05), (25.05, 25.05), (35.05, -20.05), (5.05, -55.05)]
RPT_LEVEL = 8
# 10-vertex concave star (alternating 45/18-degree radii around
# (5.05, -10.05)): the non-convex covering path.  Two-decimal vertices can
# never coincide with the one-decimal synthetic grid, so no data point sits
# on a vertex latitude (the crossing test's `y1 > y` flip line).
STAR_POLY = [
    (50.05, -10.05), (19.61, -20.63), (18.96, -52.85), (-0.51, -27.17),
    (-31.36, -36.5), (-12.95, -10.05), (-31.36, 16.4), (-0.51, 7.07),
    (18.96, 32.75), (19.61, 0.53),
]
# diamond HOLE punched in the star's body (multi-ring even-odd: a point
# inside both rings has even total parity -> OUT); two-decimal vertices
# again avoid the one-decimal grid's flip lines
STAR_HOLE = [(9.07, -10.05), (5.05, -6.03), (1.03, -10.05), (5.05, -14.07)]
STAR_RINGS = [STAR_POLY, STAR_HOLE]


def polygon_customers(sf_dir: str) -> pa.Table:
    """Polygon Intersects filter via recursive prefix-tree grid
    (`lucene/spatial/src/java/org/apache/lucene/spatial/prefix/
    RecursivePrefixTreeStrategy.java` over `QuadPrefixTree.java`): the
    convex query polygon is covered ONCE on the driver by quad-tree cells
    (WITHIN cells accept their points with no geometry test — Lucene's
    covered-non-leaf match; boundary leaves fall through to the exact
    half-plane predicate — Lucene's leaf verification).  Same deterministic
    synthetic 0.1-degree-grid coordinates as :func:`geofilt_customers`; at
    level 8 ~96% of matching points are accepted by integer prefix compare
    alone.  The SQL oracle replays only the exact predicate (the covering
    is an engine-side accelerator, not a semantics change), with the
    identical float64 cross-product expression order.

    Scale shape: the covering is O(4^level boundary cells) computed once
    and closed over (tiny); the per-batch work is numpy shift/isin +
    half-plane math on the boundary slice — stateless ``map_batches``, no
    shuffle, no driver state."""
    from ..functions.spatial_rpt import (
        candidate_mask,
        cover_convex,
        point_in_convex,
        quad_codes,
    )

    within_cells, boundary_leaves = cover_convex(RPT_POLY, RPT_LEVEL)

    def keep(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        lat, lon = _synthetic_latlon(keys)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, needs_verify = candidate_mask(
            codes, within_cells, boundary_leaves, RPT_LEVEL
        )
        if needs_verify.any():
            idx = np.flatnonzero(needs_verify)
            accepted[idx] = point_in_convex(lat[idx], lon[idx], RPT_POLY)
        return t.filter(pa.array(accepted))

    out = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table({"c_custkey": sorted(out["c_custkey"].astype("int64").tolist())})


def polygon_star_customers(sf_dir: str) -> pa.Table:
    """Non-convex polygon-WITH-HOLE Intersects via the general covering
    (`RecursivePrefixTreeStrategy.java` recursion with spatial4j's even-odd
    containment): a concave 10-vertex star minus a diamond hole is covered
    by quad-tree cells using the edge-crossing rect classifier — total
    crossing parity is constant over any cell no edge of ANY ring touches,
    so WITHIN cells accept by integer prefix compare and only boundary
    leaves run the exact multi-ring crossing predicate.  The SQL oracle
    replays the parity sum over the flattened edge set with the identical
    float64 expression order.  Same stateless ``map_batches`` scale shape
    as :func:`polygon_customers`."""
    from ..functions.spatial_rpt import (
        candidate_mask,
        cover_rings,
        point_in_rings,
        quad_codes,
    )

    within_cells, boundary_leaves = cover_rings(STAR_RINGS, RPT_LEVEL)

    def keep(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        lat, lon = _synthetic_latlon(keys)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, needs_verify = candidate_mask(
            codes, within_cells, boundary_leaves, RPT_LEVEL
        )
        if needs_verify.any():
            idx = np.flatnonzero(needs_verify)
            accepted[idx] = point_in_rings(lat[idx], lon[idx], STAR_RINGS)
        return t.filter(pa.array(accepted))

    out = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table({"c_custkey": sorted(out["c_custkey"].astype("int64").tolist())})


# facet.heatmap grid: quad level 5 => 32x32 world grid (5.625 x 11.25 deg
# cells); the faceted region is cell-SNAPPED (Solr expands the geom to grid
# boundaries), expressed directly as inclusive cell-index ranges so the
# engine/oracle compare never touches a float
HEATMAP_LEVEL = 5
HEATMAP_ROW_RANGE = (14, 24)  # inclusive quad rows (latitude bands)
HEATMAP_COL_RANGE = (10, 20)  # inclusive quad cols (longitude bands)


def heatmap_customers(sf_dir: str) -> pa.Table:
    """Spatial heatmap faceting (``facet.heatmap`` — the
    `HeatmapFacetCounter` component shape, post-fork upstream; the grid
    itself is the fork's `lucene/spatial/src/java/org/apache/lucene/spatial/
    prefix/tree/QuadPrefixTree.java` level-5 cell lattice): per-grid-cell
    document counts over a cell-snapped query region, EVERY region cell
    emitted including zero-count cells (the counts_ints2D dense-array
    contract).

    Cell assignment happens in INTEGER space — the synthetic coordinates
    live on a 0.1-degree grid, so ``row = (ilat << level) // 1800`` over
    integer tenths is exact and the SQL oracle replays it with BIGINT
    floor division; no float ever crosses the hash gate.

    Scale shape: per-batch combiner (numpy bincount over region cells —
    the classic pre-aggregate-inside-map_batches pattern), then a driver
    merge bounded by n_region_cells x n_blocks (121 x blocks here; never
    O(corpus)).  At 100 TB the partials stay the same size; only the block
    count grows, and the merge is one reduceat over tiny vectors."""
    level = HEATMAP_LEVEL
    r0, r1 = HEATMAP_ROW_RANGE
    c0, c1 = HEATMAP_COL_RANGE
    nrows, ncols = r1 - r0 + 1, c1 - c0 + 1
    ncells = nrows * ncols

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        ilat, ilon = _synthetic_latlon_tenths(keys)
        row = (ilat << level) // 1800
        col = (ilon << level) // 3600
        m = (row >= r0) & (row <= r1) & (col >= c0) & (col <= c1)
        flat = (row[m] - r0) * ncols + (col[m] - c0)
        counts = np.bincount(flat, minlength=ncells)
        return pa.table(
            {
                "cell": np.arange(ncells, dtype=np.int64),
                "cnt": counts.astype(np.int64),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    total = np.zeros(ncells, dtype=np.int64)
    np.add.at(total, parts["cell"].to_numpy(), parts["cnt"].to_numpy())
    cells = np.arange(ncells, dtype=np.int64)
    return pa.table(
        {
            "heat_row": (r0 + cells // ncols),
            "heat_col": (c0 + cells % ncols),
            "cell_count": total,
        }
    )


def heatmap_polygon_customers(sf_dir: str) -> pa.Table:
    """facet.heatmap OVER the RPT polygon filter region — the composition of
    the two spatial surfaces (`HeatmapFacetCounter` cells gridding the doc
    set of a `RecursivePrefixTreeStrategy` Intersects filter; Solr's
    ``facet.heatmap.geom`` sets the heatmap region to the shape's
    cell-snapped BOUNDING BOX while ``fq={!field f=loc}Intersects(...)``
    restricts the counted docs to the shape itself): per-level-5-cell counts
    of the customers ACCEPTED by the star-with-hole polygon filter
    (:func:`polygon_star_customers`' exact even-odd predicate behind the
    same quad covering accelerator), over the star's bbox-snapped cell
    ranges, zero cells included (counts_ints2D dense contract).

    Cell assignment stays in INTEGER tenths space (BIGINT floor division on
    both sides); only the polygon accept decision is float64 — the same
    expression order the star oracle already replays hash-exact.

    Scale shape: one stateless ``map_batches`` doing filter + per-batch
    bincount combiner (region cells x blocks partials, never O(corpus));
    the covering and the region ranges are computed once on the driver and
    closed over."""
    from ..functions.spatial_rpt import (
        candidate_mask,
        cover_rings,
        point_in_rings,
        quad_codes,
    )

    level = HEATMAP_LEVEL
    (r0, r1), (c0, c1) = heatmap_region_for_rings(STAR_RINGS, level)
    nrows, ncols = r1 - r0 + 1, c1 - c0 + 1
    ncells = nrows * ncols
    within_cells, boundary_leaves = cover_rings(STAR_RINGS, RPT_LEVEL)

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["c_custkey"], dtype=np.int64)
        lat, lon = _synthetic_latlon(keys)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, needs_verify = candidate_mask(
            codes, within_cells, boundary_leaves, RPT_LEVEL
        )
        if needs_verify.any():
            idx = np.flatnonzero(needs_verify)
            accepted[idx] = point_in_rings(lat[idx], lon[idx], STAR_RINGS)
        keys = keys[accepted]
        ilat = (keys * 7) % 1800
        ilon = (keys * 13) % 3600
        row = (ilat << level) // 1800
        col = (ilon << level) // 3600
        m = (row >= r0) & (row <= r1) & (col >= c0) & (col <= c1)
        flat = (row[m] - r0) * ncols + (col[m] - c0)
        counts = np.bincount(flat, minlength=ncells)
        return pa.table(
            {
                "cell": np.arange(ncells, dtype=np.int64),
                "cnt": counts.astype(np.int64),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    total = np.zeros(ncells, dtype=np.int64)
    np.add.at(total, parts["cell"].to_numpy(), parts["cnt"].to_numpy())
    cells = np.arange(ncells, dtype=np.int64)
    return pa.table(
        {
            "heat_row": (r0 + cells // ncols),
            "heat_col": (c0 + cells % ncols),
            "cell_count": total,
        }
    )


def heatmap_region_for_rings(
    rings, level: int
) -> tuple[tuple[int, int], tuple[int, int]]:
    """Cell-snapped bounding box of a multi-ring shape at a heatmap level:
    inclusive (row, col) index ranges of the level-``level`` quad grid cells
    containing the shape's float bbox corners (Solr snaps
    ``facet.heatmap.geom`` outward to grid boundaries).  Driver-side, O(1);
    the SQL oracle hardcodes the resulting constants (asserted equal in
    pytest)."""
    import math

    lats = [y for ring in rings for (y, _x) in ring]
    lons = [x for ring in rings for (_y, x) in ring]
    n = 1 << level
    r0 = int(math.floor((min(lats) + 90.0) * n / 180.0))
    r1 = int(math.floor((max(lats) + 90.0) * n / 180.0))
    c0 = int(math.floor((min(lons) + 180.0) * n / 360.0))
    c1 = int(math.floor((max(lons) + 180.0) * n / 360.0))
    clamp = lambda v: max(0, min(n - 1, v))  # noqa: E731
    return (clamp(r0), clamp(r1)), (clamp(c0), clamp(c1))


def kmeans_clusters_docs(sf_dir: str) -> pa.Table:
    """Corpus k-means clustering (clustering-contrib surface analog,
    `solr/contrib/clustering/`): hashed-TF-IDF Lloyd iterations with
    broadcast centroids; rows-only driver gate (iterative, not
    SQL-expressible), planted-topic purity gated in pytest."""
    from ..stages.clustering import kmeans_docs

    out, _ = kmeans_docs(_docs(sf_dir, ["doc_id", "text"]), k=8, dim=128, iters=8)
    pdf = out.to_pandas().sort_values("doc_id")
    return pa.table(
        {
            "doc_id": pdf["doc_id"].astype("int64").tolist(),
            "cluster": pdf["cluster"].astype("int64").tolist(),
        }
    )
