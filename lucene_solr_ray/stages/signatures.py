"""Document signature stages (SignatureUpdateProcessor family).

Re-specification of
``solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java:40-99``
and its three signature impls as Ray Data ``map_batches`` column producers:

* :func:`md5_signature_batch` — ``MD5Signature.java`` (exact hash of the
  concatenated field values).
* :func:`lookup3_signature_batch` — ``Lookup3Signature.java`` (64-bit
  non-crypto hash; we use a 64-bit FNV-1a with the same role: cheap exact
  signature.  Documented deviation: the exact bit pattern differs from
  Bob Jenkins' lookup3, the dedup semantics do not).
* :func:`text_profile_signature_batch` — ``TextProfileSignature.java:49-63``
  (Nutch): tokenize, drop tokens shorter than MIN_TOKEN_LEN, quantize term
  freqs by ``max(1, maxFreq/QUANT_RATE)``, drop terms quantized to 0, sort by
  (freq desc, term asc), hash the "term freq term freq ..." profile — a
  near-duplicate signature.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import simple_tokenize


def _concat_fields(batch: pa.Table, fields: list[str]) -> list[str]:
    cols = [batch[f].to_pylist() for f in fields]
    return ["".join(str(v) for v in vals if v is not None) for vals in zip(*cols)]


def md5_signature_batch(batch: pa.Table, *, fields: list[str], out: str = "signature") -> pa.Table:
    # MD5 is the reference's exact signature contract — the per-row digest
    # loop is inherent (hashlib has no batch API); the concat stays columnar
    sigs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in _concat_fields(batch, fields)]
    return batch.append_column(out, pa.array(sigs, type=pa.string()))


def lookup3_signature_batch(batch: pa.Table, *, fields: list[str], out: str = "signature") -> pa.Table:
    """64-bit non-crypto signature, fully vectorized (one polynomial-hash
    pass over the flat byte buffer — ``hashing.hash_strings_u64``).  Same
    documented deviation as before: the bit pattern differs from Bob Jenkins'
    lookup3; the exact-dedup semantics (equal text <=> equal signature up to
    64-bit collisions) do not."""
    import pyarrow.compute as pc

    from ..hashing import hash_strings_u64

    cols = [pc.fill_null(pc.cast(batch[f], pa.string()), "") for f in fields]
    joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(*cols, "")
    sigs = hash_strings_u64(joined)
    hexed = pc.utf8_lpad(
        pc.cast(pa.array(sigs, type=pa.uint64()), pa.string()), 20, "0"
    )
    # decimal (zero-padded, order-preserving) rather than hex: keeps the
    # whole row vectorized; the signature contract is opaque-token equality
    return batch.append_column(out, hexed)


def _quant_of(max_freq: int, quant_rate: float) -> int:
    """``Math.round(maxFreq * quantRate)`` floored at 2 (1 when maxFreq==1) —
    `TextProfileSignature.java:110-116`.  Replayed in FLOAT32 (Java float
    arithmetic + ``Math.round(float) == floor(x + 0.5f)``) so boundary
    frequencies quantize identically."""
    q0 = int(np.floor(np.float32(max_freq) * np.float32(quant_rate) + np.float32(0.5)))
    if q0 >= 2:
        return q0
    return 2 if max_freq > 1 else 1


def text_profile_signature(text: str, quant_rate: float = 0.01, min_token_len: int = 2) -> str:
    # token kept only when STRICTLY longer than minTokenLen
    # (`TextProfileSignature.java:79` `curToken.length() > minTokenLen` —
    # the reference drops length-2 tokens at the default setting)
    toks = [t for t in simple_tokenize(text or "") if len(t) > min_token_len]
    if not toks:
        return hashlib.md5(b"").hexdigest()
    freqs: dict[str, int] = {}
    for t in toks:
        freqs[t] = freqs.get(t, 0) + 1
    max_freq = max(freqs.values())
    quant = _quant_of(max_freq, quant_rate)
    prof = [(t, (f // quant) * quant) for t, f in freqs.items()]
    prof = [(t, f) for t, f in prof if f > 0]
    prof.sort(key=lambda tf: (-tf[1], tf[0]))
    blob = " ".join(f"{t} {f}" for t, f in prof)
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def text_profile_signature_batch(batch: pa.Table, *, text_col: str = "text", out: str = "signature") -> pa.Table:
    """Vectorized TextProfileSignature: tokenize + per-(row, term) counting +
    freq quantization happen columnar (one Arrow flatten + pandas C groupby);
    only the final per-row MD5 digest of the profile blob is a Python loop
    (inherent — hashlib has no batch API).  Output is identical to
    :func:`text_profile_signature` (differential-tested)."""
    import pandas as pd

    from .textstats import _token_lists

    flat, row_of, tok_len = _token_lists(batch[text_col])
    n = batch.num_rows
    keep = tok_len > 2  # strictly longer than minTokenLen (reference parity)
    empty_sig = hashlib.md5(b"").hexdigest()
    sigs = [empty_sig] * n
    if keep.any():
        df = pd.DataFrame(
            {"r": row_of[keep], "t": flat.filter(pa.array(keep)).to_pandas()}
        )
        cnt = df.groupby(["r", "t"], sort=False).size().reset_index(name="f")
        mx = cnt.groupby("r")["f"].transform("max").to_numpy()
        f = cnt["f"].to_numpy()
        # quant = Math.round(maxFreq * QUANT_RATE) floored at 2 (1 when
        # maxFreq == 1) — float32 replay of _quant_of, vectorized
        q0 = np.floor(
            mx.astype(np.float32) * np.float32(0.01) + np.float32(0.5)
        ).astype(np.int64)
        quant = np.where(q0 >= 2, q0, np.where(mx > 1, 2, 1)).astype(np.int64)
        cnt["qf"] = (f // quant) * quant
        cnt = cnt[cnt["qf"] > 0]
        if len(cnt):
            cnt = cnt.sort_values(
                ["r", "qf", "t"], ascending=[True, False, True], kind="mergesort"
            )
            pairs = cnt["t"] + " " + cnt["qf"].astype(str)
            blobs = pairs.groupby(cnt["r"].to_numpy()).agg(" ".join)
            for r, blob in blobs.items():
                sigs[r] = hashlib.md5(blob.encode("utf-8")).hexdigest()
    return batch.append_column(out, pa.array(sigs, type=pa.string()))
