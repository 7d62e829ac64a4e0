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
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out, pa.array(preds, type=pa.string()))


def token_count_batch(batch: pa.Table, *, text_col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace/punct token count (simple tokenizer — SQL-parity)."""
    counts = [len(simple_tokenize(t or "")) for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(counts, type=pa.int64()))


def quality_score_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality heuristics: alpha ratio, stopword ratio, mean token length.

    Emits integer counts plus one final float ratio (integer arithmetic until
    a single division — keeps the DuckDB oracle bit-identical)."""
    texts = batch[text_col].to_pylist()
    n_chars, n_alpha, n_tokens, n_stop, sum_tok_len = [], [], [], [], []
    prof = _PROFILES["en"]
    for t in texts:
        t = t or ""
        toks = simple_tokenize(t)
        n_chars.append(len(t))
        n_alpha.append(sum(c.isalpha() for c in t))
        n_tokens.append(len(toks))
        n_stop.append(sum(tok in prof for tok in toks))
        sum_tok_len.append(sum(len(tok) for tok in toks))
    out = dict(zip(batch.column_names, batch.columns))
    out["n_chars_m"] = pa.array(n_chars, type=pa.int64())
    out["n_alpha"] = pa.array(n_alpha, type=pa.int64())
    out["n_tokens"] = pa.array(n_tokens, type=pa.int64())
    out["n_stopwords"] = pa.array(n_stop, type=pa.int64())
    out["sum_token_len"] = pa.array(sum_tok_len, type=pa.int64())
    t = pa.table(out)
    alpha_ratio = pc.divide(
        pc.cast(t["n_alpha"], pa.float64()),
        pc.cast(pc.max_element_wise(t["n_chars_m"], 1), pa.float64()),
    )
    return t.append_column("alpha_ratio", alpha_ratio)


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text", out: str = "fingerprint") -> pa.Table:
    """64-bit rolling-hash document fingerprint (FNV-1a over the token
    stream) — order-sensitive, whitespace/punct-insensitive."""
    fps = []
    for t in batch[text_col].to_pylist():
        h = 0xCBF29CE484222325
        for tok in simple_tokenize(t or ""):
            for b in tok.encode("utf-8") + b"\x1f":
                h ^= b
                h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        fps.append(h)
    return batch.append_column(out, pa.array(np.array(fps, dtype=np.uint64), type=pa.uint64()))
