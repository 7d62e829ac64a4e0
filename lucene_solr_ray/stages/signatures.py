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
    sigs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in _concat_fields(batch, fields)]
    return batch.append_column(out, pa.array(sigs, type=pa.string()))


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def lookup3_signature_batch(batch: pa.Table, *, fields: list[str], out: str = "signature") -> pa.Table:
    sigs = [f"{_fnv1a64(s.encode('utf-8')):016x}" for s in _concat_fields(batch, fields)]
    return batch.append_column(out, pa.array(sigs, type=pa.string()))


def text_profile_signature(text: str, quant_rate: float = 0.01, min_token_len: int = 2) -> str:
    toks = [t for t in simple_tokenize(text or "") if len(t) >= min_token_len]
    if not toks:
        return hashlib.md5(b"").hexdigest()
    freqs: dict[str, int] = {}
    for t in toks:
        freqs[t] = freqs.get(t, 0) + 1
    max_freq = max(freqs.values())
    quant = max(2, int(max_freq * quant_rate)) if max_freq > 1 else 1
    prof = [(t, (f // quant) * quant) for t, f in freqs.items()]
    prof = [(t, f) for t, f in prof if f > 0]
    prof.sort(key=lambda tf: (-tf[1], tf[0]))
    blob = " ".join(f"{t} {f}" for t, f in prof)
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def text_profile_signature_batch(batch: pa.Table, *, text_col: str = "text", out: str = "signature") -> pa.Table:
    sigs = [text_profile_signature(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(sigs, type=pa.string()))
