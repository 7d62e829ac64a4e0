"""SignatureUpdateProcessor family: the vectorized batch kernels must agree
with the scalar reference implementations row-for-row, and TextProfile must
behave as a NEAR-dup signature (quantization collapses small freq changes)."""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _docs():
    base = ("join hash " * 120) + ("vector scan " * 80) + "window stream merge sort"
    near = base.replace("window", "table", 1)  # small perturbation
    return pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": [
                base,
                near,
                "a bb ccc bb a",  # short tokens dropped (len >= 2)
                "",
                "x y z",  # ALL tokens shorter than 2 -> empty profile
                "completely different content here entirely",
            ],
        }
    )


def test_text_profile_batch_equals_scalar():
    from lucene_solr_ray.stages.signatures import (
        text_profile_signature,
        text_profile_signature_batch,
    )

    t = _docs()
    out = text_profile_signature_batch(t)["signature"].to_pylist()
    ref = [text_profile_signature(s) for s in t["text"].to_pylist()]
    assert out == ref


def test_text_profile_is_near_dup_signature():
    from lucene_solr_ray.stages.signatures import text_profile_signature_batch

    t = _docs()
    sig = text_profile_signature_batch(t)["signature"].to_pylist()
    # high-freq profile quantization collapses the one-word perturbation
    assert sig[0] == sig[1]
    assert sig[0] != sig[5]
    # empty text and all-short-tokens text hash the empty profile
    assert sig[3] == sig[4] == hashlib.md5(b"").hexdigest()


def test_lookup3_vectorized_signature_contract():
    from lucene_solr_ray.stages.signatures import lookup3_signature_batch

    t = pa.table(
        {
            "a": ["x", "x", "y", None],
            "b": ["1", "1", "1", "1"],
        }
    )
    sig = lookup3_signature_batch(t, fields=["a", "b"])["signature"].to_pylist()
    assert sig[0] == sig[1]  # equal concatenated text -> equal signature
    assert sig[0] != sig[2]
    assert sig[3] is not None and len(sig[3]) == 20  # null -> '' contribution
    assert all(len(s) == 20 and s.isdigit() for s in sig)
