"""Text analysis stages: language-ID, quality scoring, token counts,
document fingerprinting.

Reference analogs: `LanguageIdentifierUpdateProcessor`
(``solr/contrib/langid/.../LanguageIdentifierUpdateProcessor.java``) and the
field-mutating update processors (SURVEY.md §2.2); the rest are the
training-data-pipeline extensions the task brief requires.
All are vectorizable ``map_batches`` column producers; language-ID is a
callable CLASS (profiles built once per actor) for the actor-pool pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.tokenizer import simple_tokenize

# minimal stopword profiles per language (deterministic, public knowledge)
_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to in is it that for with as was on are this by".split()),
    "de": frozenset("der die das und ist nicht ein eine mit für von den dem zu im".split()),
    "fr": frozenset("le la les et des une dans est pour que qui sur pas plus par".split()),
    "es": frozenset("el la los las y una en es para que del con por más como".split()),
    "da": frozenset("og i det at en den til er som på de med han af for".split()),
}


class LanguageId:
    """Actor-pool language classifier (profiles compiled in __init__).

    Heuristic: CJK script detection first (ja if kana present, else zh);
    otherwise argmax of stopword-profile hit counts; tie/no-hit -> 'und'.
    """

    def __init__(self, text_col: str = "text", out: str = "lang_pred"):
        self.text_col = text_col
        self.out = out
        self.profiles = {k: v for k, v in _PROFILES.items()}

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        kana = sum("぀" <= c <= "ヿ" for c in text)
        han = sum("一" <= c <= "鿿" for c in text)
        if kana > 0 and kana + han > len(text) * 0.05:
            return "ja"
        if han > len(text) * 0.1:
            return "zh"
        toks = simple_tokenize(text)
        if not toks:
            return "und"
        scores = {
            lang: sum(t in prof for t in toks) for lang, prof in self.profiles.items()
        }
        best = max(sorted(scores), key=lambda L: scores[L])
        if scores[best] == 0:
            return "und"
        # tie -> "und" (class contract): an alphabetical winner would be
        # an arbitrary pick between equally-scored languages
        if sum(1 for v in scores.values() if v == scores[best]) > 1:
            return "und"
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out, pa.array(preds, type=pa.string()))


def _token_lists(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """lower -> split on [^a-z0-9]+ -> (flat tokens incl. empties, row_of,
    per-token utf8 lengths).  All Arrow C++ kernels; no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lower = pc.utf8_lower(pc.fill_null(col, ""))
    toks = pc.split_pattern_regex(lower, "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lens = np.asarray(toks.value_lengths(), dtype=np.int64)
    row_of = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    tok_len = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    return flat, row_of, tok_len


def token_count_batch(batch: pa.Table, *, text_col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Simple-tokenizer token count (SQL-parity), fully vectorized."""
    flat, row_of, tok_len = _token_lists(batch[text_col])
    counts = np.bincount(row_of[tok_len > 0], minlength=batch.num_rows).astype(np.int64)
    return batch.append_column(out, pa.array(counts, type=pa.int64()))


BPE_PRETOKEN_RE = (
    # GPT-2-style pre-tokenizer (Radford et al. 2019), RE2-compatible subset
    # (no lookahead branches): contractions, optionally-space-prefixed
    # letter / digit / punctuation runs; pure-whitespace runs are not tokens
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"
)


def bpe_token_count_batch(batch: pa.Table, *, text_col: str = "text",
                          out: str = "n_bpe_tokens") -> pa.Table:
    """BPE-ish pre-tokenizer token count (the GPT-2 pattern family): a
    training-data cost estimator — one vectorized RE2 count per batch."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    text = pc.fill_null(col, "")
    n = pc.cast(pc.count_substring_regex(text, BPE_PRETOKEN_RE), pa.int64())
    return batch.append_column(out, n)


def quality_score_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality heuristics: alpha ratio, stopword ratio, mean token length.

    Integer counts plus one final float ratio (integer arithmetic until a
    single division — keeps the DuckDB oracle bit-identical).  Vectorized:
    Arrow regex/count kernels + one token flatten + numpy bincounts."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    text = pc.fill_null(col, "")
    n = batch.num_rows
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
    flat, row_of, tok_len = _token_lists(col)
    n_tokens = np.bincount(row_of[tok_len > 0], minlength=n).astype(np.int64)
    stop_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(sorted(_PROFILES["en"]))), dtype=bool
    )
    n_stop = np.bincount(row_of[stop_mask], minlength=n).astype(np.int64)
    sum_tok_len = np.bincount(row_of, weights=tok_len, minlength=n).astype(np.int64)
    out = dict(zip(batch.column_names, batch.columns))
    out["n_chars_m"] = n_chars
    out["n_alpha"] = n_alpha
    out["n_tokens"] = pa.array(n_tokens, type=pa.int64())
    out["n_stopwords"] = pa.array(n_stop, type=pa.int64())
    out["sum_token_len"] = pa.array(sum_tok_len, type=pa.int64())
    t = pa.table(out)
    alpha_ratio = pc.divide(
        pc.cast(t["n_alpha"], pa.float64()),
        pc.cast(pc.max_element_wise(t["n_chars_m"], 1), pa.float64()),
    )
    return t.append_column("alpha_ratio", alpha_ratio)


# PII patterns (RE2-compatible — both pyarrow and DuckDB compile via RE2, so
# the SQL oracle is bit-identical by construction): the standard web-corpus
# scrub set (emails, IPv4, long digit runs/phone-like)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\-\(\) ]{7,}\d", "<PHONE>"),
)


def pii_scrub_batch(batch: pa.Table, *, text_col: str = "text",
                    out: str = "scrubbed") -> pa.Table:
    """PII redaction for training corpora (the CCNet/Dolma-style scrub pass):
    emails -> <EMAIL>, IPv4 -> <IP>, phone-like digit runs -> <PHONE>.
    One vectorized RE2 replace per pattern; adds a per-row replacement
    count so pipelines can quarantine PII-heavy docs."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    cur = pc.fill_null(col, "")
    n_hits = np.zeros(batch.num_rows, dtype=np.int64)
    for pat, repl in PII_PATTERNS:
        n_hits += np.asarray(pc.count_substring_regex(cur, pat), dtype=np.int64)
        cur = pc.replace_substring_regex(cur, pat, repl)
    out_cols = dict(zip(batch.column_names, batch.columns))
    out_cols[out] = cur
    out_cols["n_pii"] = pa.array(n_hits, type=pa.int64())
    return pa.table(out_cols)


def stopword_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Stopword count/ratio over Lucene's 33-word English stop set
    (`StopAnalyzer.ENGLISH_STOP_WORDS_SET`) — the CCNet-style language-
    quality heuristic, vectorized (one flatten + ``pc.is_in`` + bincounts)."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS

    flat, row_of, tok_len = _token_lists(batch[text_col])
    n = batch.num_rows
    n_tokens = np.bincount(row_of[tok_len > 0], minlength=n).astype(np.int64)
    stop_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(sorted(ENGLISH_STOP_WORDS))), dtype=bool
    )
    n_stop = np.bincount(row_of[stop_mask], minlength=n).astype(np.int64)
    out = dict(zip(batch.column_names, batch.columns))
    out["n_stopwords"] = pa.array(n_stop, type=pa.int64())
    out["n_tokens"] = pa.array(n_tokens, type=pa.int64())
    out["stop_ratio"] = pa.array(
        n_stop / np.maximum(n_tokens, 1), type=pa.float64()
    )
    return pa.table(out)


def repetition_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    "Scaling Language Models", §A.1.1 quality filters): per doc over the
    simple tokenization —

    * ``n_trigrams`` / ``n_dup_trigrams``: total vs duplicated token 3-grams
      (total - distinct); ``dup_trigram_frac`` = dup/total (0.0 when no
      trigrams).  High values flag boilerplate/spam for LLM corpus filtering.
    * ``top_bigram_n``: occurrences of the doc's most frequent token 2-gram.

    Vectorized: one Arrow token flatten, adjacency joins via
    ``binary_join_element_wise``, per-row distinct/max via pandas C groupby
    (exact string keys — no hash-collision risk vs the SQL oracle)."""
    import pandas as pd

    flat, row_of, tok_len = _token_lists(batch[text_col])
    n = batch.num_rows
    keep = tok_len > 0
    ftoks = flat.filter(pa.array(keep))
    frow = row_of[keep]

    def grams(k: int) -> tuple[np.ndarray, pa.Array]:
        """rows + joined gram strings for within-row runs of k tokens."""
        if len(frow) < k:
            return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
        ok = frow[: len(frow) - k + 1] == frow[k - 1 :]
        parts = [ftoks.slice(i, len(frow) - k + 1) for i in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        return frow[: len(frow) - k + 1][ok], joined.filter(pa.array(ok))

    tri_rows, tri = grams(3)
    n_tri = np.bincount(tri_rows, minlength=n).astype(np.int64)
    if len(tri_rows):
        df3 = pd.DataFrame({"r": tri_rows, "g": tri.to_pandas()})
        dist = df3.groupby("r")["g"].nunique()
        n_dist = np.zeros(n, dtype=np.int64)
        n_dist[dist.index.to_numpy()] = dist.to_numpy()
    else:
        n_dist = np.zeros(n, dtype=np.int64)
    n_dup = n_tri - n_dist

    bi_rows, bi = grams(2)
    top_bi = np.zeros(n, dtype=np.int64)
    if len(bi_rows):
        df2 = pd.DataFrame({"r": bi_rows, "g": bi.to_pandas()})
        mx = df2.groupby(["r", "g"]).size().groupby("r").max()
        top_bi[mx.index.to_numpy()] = mx.to_numpy()

    frac = np.where(n_tri > 0, n_dup / np.maximum(n_tri, 1), 0.0)
    out = dict(zip(batch.column_names, batch.columns))
    out["n_trigrams"] = pa.array(n_tri, type=pa.int64())
    out["n_dup_trigrams"] = pa.array(n_dup, type=pa.int64())
    out["dup_trigram_frac"] = pa.array(frac, type=pa.float64())
    out["top_bigram_n"] = pa.array(top_bi, type=pa.int64())
    return pa.table(out)


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text", out: str = "fingerprint") -> pa.Table:
    """64-bit rolling-hash document fingerprint over the normalized token
    stream (tokens joined by \\x1f, polynomial hash) — order-sensitive,
    whitespace/punct-insensitive, vectorized end-to-end."""
    from ..hashing import hash_strings_u64

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lower = pc.utf8_lower(pc.fill_null(col, ""))
    norm = pc.replace_substring_regex(lower, "[^a-z0-9]+", "\x1f")
    norm = pc.replace_substring_regex(norm, "^\x1f|\x1f$", "")
    fps = hash_strings_u64(norm)
    return batch.append_column(out, pa.array(fps, type=pa.uint64()))


# ---- unigram LM quality score (CCNet-style) ---------------------------------


def unigram_lm_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc average token log-probability under the corpus unigram
    distribution — the CCNet-style LM quality signal (lower = more
    out-of-distribution; used to bucket web text into head/middle/tail).

    Scale shape: a production unigram LM is a FIXED, pruned vocabulary
    (top-K terms), i.e. broadcast-sized regardless of corpus size.  Pass 1
    builds the (term, ttf) table distributed (per-batch partial counts ->
    one small groupby on the term hash) and ships it to the driver at
    vocab size only; the scoring pass is one stateless ``map_batches``
    probing a sorted hash array + logprob array broadcast once via
    ``ray.put``.  Returns (id_col, n_tokens, avg_logprob) rows; docs with 0
    tokens get avg_logprob = 0.0.  ``avg_logprob`` is rounded to 6 decimals
    (the output contract — keeps the value independent of float summation
    order across engines).
    """
    import ray

    from ..hashing import hash_strings_u64

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, _row, tok_len = _token_lists(batch[text_col])
        keep = tok_len > 0
        h = hash_strings_u64(flat)[keep].astype(np.int64)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uniq, type=pa.int64()),
            "c": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    ttf = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("h")
        .sum("c")
        .to_pandas()  # vocab-sized by the pruned-LM contract
    )
    hs = ttf["h"].to_numpy(dtype=np.int64)
    cs = ttf["sum(c)"].to_numpy(dtype=np.float64)
    order = np.argsort(hs)
    hs, cs = hs[order], cs[order]
    total = float(cs.sum())
    lp = np.log(cs / total)
    ref = ray.put((hs, lp))

    def score(batch: pa.Table) -> pa.Table:
        h_sorted, logp = ray.get(ref)
        flat, row_of, tok_len = _token_lists(batch[text_col])
        keep = tok_len > 0
        h = hash_strings_u64(flat)[keep].astype(np.int64)
        rows = row_of[keep]
        idx = np.searchsorted(h_sorted, h)
        idx = np.minimum(idx, max(len(h_sorted) - 1, 0))
        # every token is in-vocab when the LM was built on this corpus;
        # out-of-vocab tokens (pruned LM) contribute nothing
        hit = h_sorted[idx] == h if len(h_sorted) else np.zeros(len(h), bool)
        n = batch.num_rows
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        sums = np.zeros(n, dtype=np.float64)
        np.add.at(sums, rows[hit], logp[idx[hit]])
        avg = np.divide(sums, n_tok, out=np.zeros(n, dtype=np.float64),
                        where=n_tok > 0)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "avg_logprob": pa.array(np.round(avg, 6), type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc average bigram CONDITIONAL log-probability
    ``mean over in-doc bigrams of ln(C(t1 t2) / C(t1 ·))`` under the corpus
    bigram distribution — the next step up from :func:`unigram_lm_scores`
    on the CCNet-style LM-quality ladder (KenLM n-gram filtering).

    Scale shape identical to the unigram scorer: two distributed partial
    count passes (bigram table + left-marginal table, each a per-batch
    ``np.unique`` combiner then one small hash groupby), both broadcast
    once via ``ray.put`` at pruned-LM size, then one stateless scoring
    ``map_batches``.  LM tables are keyed by u64 hash (the hashed-LM
    production caveat, same as the k-means hashed TF-IDF).  Docs with < 2
    tokens score 0.0 with n_bigrams = 0; avg_logprob is rounded to 6
    decimals in the output contract (summation-order independence)."""
    import ray

    from ..hashing import _MIX, hash_strings_u64

    def _bigram_keys(batch: pa.Table):
        flat, row_of, tok_len = _token_lists(batch[text_col])
        keep = tok_len > 0
        h = hash_strings_u64(flat)[keep]
        rows = row_of[keep]
        if len(h) < 2:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        same = rows[:-1] == rows[1:]
        h1 = h[:-1][same]
        h2 = h[1:][same]
        with np.errstate(over="ignore"):
            h12 = ((h1 * np.uint64(1099511628211) + h2) * _MIX) >> np.uint64(1)
        return (
            h12.astype(np.int64),
            (h1 >> np.uint64(1)).astype(np.int64),
            rows[:-1][same],
        )

    def partial_bigram(batch: pa.Table) -> pa.Table:
        h12, _h1, _r = _bigram_keys(batch)
        u, c = np.unique(h12, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()),
                         "c": pa.array(c.astype(np.int64), type=pa.int64())})

    def partial_left(batch: pa.Table) -> pa.Table:
        _h12, h1, _r = _bigram_keys(batch)
        u, c = np.unique(h1, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()),
                         "c": pa.array(c.astype(np.int64), type=pa.int64())})

    def _lm_table(rows_ds):
        df = rows_ds.groupby("h").sum("c").to_pandas()  # pruned-LM sized
        hs = df["h"].to_numpy(dtype=np.int64)
        cs = df["sum(c)"].to_numpy(dtype=np.float64)
        order = np.argsort(hs)
        return hs[order], cs[order]

    c12 = _lm_table(ds.map_batches(partial_bigram, batch_format="pyarrow"))
    c1 = _lm_table(ds.map_batches(partial_left, batch_format="pyarrow"))
    ref = ray.put((c12, c1))

    def score(batch: pa.Table) -> pa.Table:
        (h12_s, c12_v), (h1_s, c1_v) = ray.get(ref)
        h12, h1, rows = _bigram_keys(batch)
        n = batch.num_rows
        nb = np.bincount(rows, minlength=n).astype(np.int64)
        i12 = np.searchsorted(h12_s, h12)
        i1 = np.searchsorted(h1_s, h1)
        # LM built on this corpus: every in-doc bigram is in-table
        lp = np.log(c12_v[np.minimum(i12, max(len(h12_s) - 1, 0))]
                    / c1_v[np.minimum(i1, max(len(h1_s) - 1, 0))])
        sums = np.zeros(n, dtype=np.float64)
        np.add.at(sums, rows, lp)
        avg = np.divide(sums, nb, out=np.zeros(n, dtype=np.float64),
                        where=nb > 0)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_bigrams": pa.array(nb, type=pa.int64()),
            "avg_logprob": pa.array(np.round(avg, 6), type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def free_text_suggest(ds, queries, *, alpha: float = 0.4, top: int = 10,
                      text_col: str = "text"):
    """FreeTextSuggester analog
    (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/FreeTextSuggester.java:66-131`):
    next-token completion from a corpus 2-gram model with STUPID BACKOFF
    (Brants et al. 2007, the reference's ALPHA=0.4 at
    `FreeTextSuggester.java:123`).  Query parse mirrors the reference's
    lookup contract: if the raw query ends mid-token the last token is the
    completion PREFIX and the token before it the context; a trailing
    separator means "suggest the next word" (empty prefix, last token is
    the context).

    Scoring: bigram candidates (context, w) score ``C(ctx w) / C(ctx ·)``
    (highest available order, no penalty); unigram backoff candidates —
    prefix matches NOT already suggested at bigram order — score
    ``alpha * C(w) / T``.  With no context the unigram order IS the highest:
    ``C(w) / T``.  Ranked (score desc, term asc), top ``top`` per query.

    Shape: one distributed counting pass (per-batch Arrow value_counts
    partials for each query's candidate sets + marginals, then a small
    multi-key groupby), then a (qid, term) fold that scores every candidate
    dataset-side and ships only per-block top-`top` partials (exact: one
    row per (qid, term) post-fold, so the global top-`top` by
    (score desc, term asc) is a subset of the block-partial union).  The
    driver holds O(#queries) marginal rows + <= top x blocks scored rows —
    BOTH candidate sets (vocab-sized for a stopword context or an empty
    prefix) stay distributed.  Returns
    ``[(query, rank, term, score)]`` with score rounded to 6 decimals (the
    cross-engine float contract used by every LM gate in this module)."""
    import re

    parsed = []
    for qid, q in enumerate(queries):
        ql = q.lower()
        ends_mid = bool(re.search(r"[a-z0-9]$", ql))
        toks = [t for t in re.split(r"[^a-z0-9]+", ql) if t]
        if ends_mid:
            prefix = toks[-1] if toks else ""
            ctx = toks[-2] if len(toks) >= 2 else None
        else:
            prefix = ""
            ctx = toks[-1] if toks else None
        parsed.append((qid, ctx, prefix))

    def partial(batch: pa.Table) -> pa.Table:
        flat, row_of, tok_len = _token_lists(batch[text_col])
        keep = tok_len > 0
        toks = flat.filter(pa.array(keep))
        rows = row_of[keep]
        same = rows[:-1] == rows[1:] if len(rows) > 1 else np.empty(0, bool)
        a = toks.slice(0, max(len(toks) - 1, 0))
        b = toks.slice(1)
        out_q, out_k, out_t, out_c = [], [], [], []

        def emit(qid, kind, terms, counts):
            out_q.extend([qid] * len(terms))
            out_k.extend([kind] * len(terms))
            out_t.extend(terms)
            out_c.extend(counts)

        emit(-1, "t", [""], [len(toks)])
        for qid, ctx, prefix in parsed:
            # unigram candidates: prefix matches over all tokens
            um = pc.starts_with(toks, prefix).to_numpy(zero_copy_only=False)
            if um.any():
                vc = pc.value_counts(toks.filter(pa.array(um)))
                emit(qid, "u", vc.field("values").to_pylist(),
                     vc.field("counts").to_pylist())
            if ctx is None:
                continue
            cm = pc.equal(a, ctx).to_numpy(zero_copy_only=False).astype(bool) & same
            n_left = int(cm.sum())
            if n_left:
                emit(qid, "l", [""], [n_left])
                bm = cm & pc.starts_with(b, prefix).to_numpy(zero_copy_only=False)
                if bm.any():
                    vc = pc.value_counts(b.filter(pa.array(bm)))
                    emit(qid, "b", vc.field("values").to_pylist(),
                         vc.field("counts").to_pylist())
        return pa.table({
            "qid": pa.array(out_q, type=pa.int64()),
            "kind": pa.array(out_k, type=pa.string()),
            "term": pa.array(out_t, type=pa.string()),
            "c": pa.array(out_c, type=pa.int64()),
        })

    agg_ds = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qid", "kind", "term"])
        .sum("c")
        .materialize()
    )
    # Only the totals ('t', one row) and context marginals ('l', one row per
    # context query) land on the driver — O(#queries), never O(vocab).  BOTH
    # candidate sets stay dataset-side: for a stopword context with an empty
    # prefix the bigram-successor set AND the prefix-match set are each
    # vocab-sized, so neither may be collected whole.
    def _typed_empty(names_types) -> "pa.Table":
        return pa.table({n: pa.array([], type=ty) for n, ty in names_types})

    def _collect(ds_part, names_types) -> "pa.Table":
        parts = [b for b in ds_part.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        return pa.concat_tables(parts) if parts else _typed_empty(names_types)

    small = _collect(
        agg_ds.filter(expr="kind == 't' or kind == 'l'"),
        [("qid", pa.int64()), ("kind", pa.string()),
         ("term", pa.string()), ("sum(c)", pa.int64())],
    ).to_pandas()
    total = float(small.loc[small["kind"] == "t", "sum(c)"].sum())
    c1_by_q = {
        int(q): float(c)
        for q, c in zip(small.loc[small["kind"] == "l", "qid"],
                        small.loc[small["kind"] == "l", "sum(c)"])
    }
    has_ctx = {qid: ctx is not None for qid, ctx, _p in parsed}

    # Fold the 'u'/'b' rows for each (qid, term) together and score every
    # term exactly once, dataset-side: bigram order wins where a 'b' row
    # exists (score c12/c1, no penalty — B is a subset of the prefix
    # matches), else the STUPID-BACKOFF unigram score.  After this groupby
    # each (qid, term) is ONE row, so the global top-`top` by
    # (score desc, term asc) is a subset of the union of per-block
    # top-`top`s — the driver receives <= top x blocks rows.
    def to_cols(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["kind"], value_set=pa.array(["u", "b"])))
        if t.num_rows == 0:
            return _typed_empty([("qid", pa.int64()), ("term", pa.string()),
                                 ("cu", pa.int64()), ("cb", pa.int64())])
        is_b = pc.equal(t["kind"], "b")
        zero = pa.scalar(0, type=pa.int64())
        return pa.table({
            "qid": t["qid"], "term": t["term"],
            "cu": pc.if_else(is_b, zero, t["sum(c)"]),
            "cb": pc.if_else(is_b, t["sum(c)"], zero),
        })

    _scored_schema = [("qid", pa.int64()), ("term", pa.string()),
                      ("score", pa.float64())]

    def score_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _typed_empty(_scored_schema)
        qids = np.asarray(t["qid"], dtype=np.int64)
        cu = np.asarray(t["cu"], dtype=np.float64)
        cb = np.asarray(t["cb"], dtype=np.float64)
        c1 = np.array([c1_by_q.get(int(q), 0.0) for q in qids])
        ctxm = np.array([has_ctx[int(q)] for q in qids])
        big = ctxm & (cb > 0) & (c1 > 0)
        # float-op order matches the pre-fold driver loop (and the DuckDB
        # oracle): c12/c1 at bigram order; alpha * (c/T) at backoff
        s_uni = cu / total if total else np.zeros_like(cu)
        s = np.where(big, cb / np.where(c1 > 0, c1, 1.0),
                     np.where(ctxm, alpha * s_uni, s_uni))
        scored = pa.table({"qid": pa.array(qids), "term": t["term"],
                           "score": pa.array(s, type=pa.float64())})
        parts = []
        for qid in np.unique(qids):
            sub = scored.filter(pc.equal(scored["qid"], int(qid)))
            idx = pc.sort_indices(
                sub, sort_keys=[("score", "descending"), ("term", "ascending")]
            )
            parts.append(sub.take(idx[:top]))
        return pa.concat_tables(parts)

    from ray.data.aggregate import Sum

    scored = _collect(
        agg_ds.map_batches(to_cols, batch_format="pyarrow")
        .groupby(["qid", "term"])
        .aggregate(Sum("cu", alias_name="cu"), Sum("cb", alias_name="cb"))
        .map_batches(score_block, batch_format="pyarrow"),
        _scored_schema,
    ).to_pandas()  # <= top x blocks rows

    out = []
    for qid, ctx, prefix in parsed:
        sub = scored[scored["qid"] == qid].sort_values(
            ["score", "term"], ascending=[False, True]
        ).head(top)
        for rank, (t, s) in enumerate(zip(sub["term"], sub["score"])):
            out.append((queries[qid], rank, t, round(float(s), 6)))
    return out
