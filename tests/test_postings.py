"""Property tests for the postings codec (round-trip, block seek, bounds)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.index.postings import (
    BLOCK,
    decode_block,
    decode_docs_freqs,
    decode_positions,
    encode_cell,
)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=700),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_round_trip(n, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(10**8, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 1000, size=n).astype(np.uint64)
    dls = (rng.random(n).astype(np.float32) * 500) + 1
    cell = encode_cell(ids, tfs, dls)
    d, f = decode_docs_freqs(cell["docs"], cell["freqs"], cell["df"])
    assert (d == ids.astype(np.int64)).all()
    assert (f == tfs.astype(np.int64)).all()
    assert cell["df"] == n
    assert cell["ttf"] == int(tfs.sum())


def test_block_seek_equals_full_decode():
    rng = np.random.default_rng(7)
    n = 513
    ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    cell = encode_cell(ids, tfs, np.ones(n, dtype=np.float32))
    full_d, full_f = decode_docs_freqs(cell["docs"], cell["freqs"], n)
    for bi in range((n + BLOCK - 1) // BLOCK):
        d, f = decode_block(cell, bi)
        s = slice(bi * BLOCK, min(n, (bi + 1) * BLOCK))
        assert (d == full_d[s]).all()
        assert (f == full_f[s]).all()


def test_blockmax_metadata_bounds():
    rng = np.random.default_rng(9)
    n = 300
    ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 40, size=n).astype(np.uint64)
    dls = rng.integers(1, 400, size=n).astype(np.float32)
    cell = encode_cell(ids, tfs, dls)
    for bi, (last, mtf, mdl) in enumerate(
        zip(cell["skip_last_doc"], cell["bm_max_tf"], cell["bm_min_dl"])
    ):
        s = slice(bi * BLOCK, min(n, (bi + 1) * BLOCK))
        assert last == int(ids[s][-1])
        assert mtf == int(tfs[s].max())
        assert mdl == pytest.approx(float(dls[s].min()))


def test_positions_round_trip():
    rng = np.random.default_rng(3)
    n = 140
    ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 8, size=n).astype(np.uint64)
    pos = [np.sort(rng.choice(10_000, size=int(t), replace=False)) for t in tfs]
    cell = encode_cell(ids, tfs, np.ones(n, dtype=np.float32), pos)
    _, f = decode_docs_freqs(cell["docs"], cell["freqs"], n)
    out = decode_positions(cell["positions"], f)
    assert all((a == b).all() for a, b in zip(out, pos))
