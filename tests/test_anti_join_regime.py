"""Loser-set anti-join regime (SCALE.md): above the broadcast threshold,
duplicate losers are spilled bucket-partitioned and anti-joined inside the
data tasks.  These tests force the threshold low and assert the result is
identical to the broadcast path — the `RetainMostRecentUpdateConflictResolver`
analog (solr/contrib/morphlines-cell heritage; see SURVEY.md §2.8).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


def test_partitioned_anti_join_equals_broadcast(ray_session, tmp_path):
    import ray.data as rd

    from lucene_solr_ray.stages.joins import broadcast_semi_join, partitioned_anti_join

    rng = np.random.default_rng(11)
    ids = np.arange(5_000, dtype=np.int64)
    vals = rng.integers(0, 1000, size=ids.size)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "v": vals})).repartition(7)
    losers = np.unique(rng.choice(ids, size=800, replace=False))
    keys_ds = rd.from_arrow(pa.table({"doc_id": pa.array(losers, type=pa.int64())}))

    via_anti = partitioned_anti_join(
        ds, keys_ds, "doc_id", str(tmp_path / "spill"), n_buckets=16
    ).take_all()
    via_bcast = broadcast_semi_join(ds, losers.tolist(), "doc_id", anti=True).take_all()

    key = lambda r: r["doc_id"]
    assert sorted(via_anti, key=key) == sorted(via_bcast, key=key)
    loser_set = set(losers.tolist())
    assert all(r["doc_id"] not in loser_set for r in via_anti)
    assert len(via_anti) == len(ids) - len(losers)


def test_build_index_anti_join_regime_identical(pages_corpus, oracle_rows, tmp_path):
    """E2E: dedup_broadcast_threshold=0 forces the partitioned anti-join
    path; the surviving doc set must equal the broadcast path's (the oracle:
    keep-most-recent per url)."""
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.reader import LocalIndex

    index_dir = str(tmp_path / "idx_anti")
    build_index(
        pages_corpus["files"],
        index_dir,
        rows_per_partition=128,
        facet_fields=(),
        dedup_broadcast_threshold=0,
    )
    li = LocalIndex(index_dir)
    kept = set()
    for p in li.parts:
        kept.update(p.doc_ids.tolist())
    assert kept == {r["doc_id"] for r in oracle_rows}
    assert os.path.isdir(os.path.join(index_dir, "dedup_losers"))


def test_minhash_dedup_anti_join_regime(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(150)]
    texts, ids = [], []
    for i in range(80):
        texts.append(" ".join(rng.choice(vocab, size=int(rng.integers(20, 50)))))
        ids.append(i)
    for j, src in enumerate([3, 9, 40]):  # exact dups -> guaranteed losers
        texts.append(texts[src])
        ids.append(100 + j)
    corpus = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})

    from lucene_solr_ray.stages.dedup import minhash_dedup

    kept_b = minhash_dedup(rd.from_arrow(corpus), rounds=None).take_all()
    kept_a = minhash_dedup(
        rd.from_arrow(corpus), rounds=None, broadcast_threshold=0
    ).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(kept_a, key=key) == sorted(kept_b, key=key)
    assert not ({100, 101, 102} & {r["doc_id"] for r in kept_a})


def test_minhash_dedup_broadcast_regime_columnar_losers(ray_session, monkeypatch):
    """The broadcast regime ships the loser set as ONE sorted columnar array:
    minhash_dedup itself never take_all()s (no Python row dicts on the driver
    at the 50M-loser boundary — round-4 verdict #2), proven by making
    Dataset.take_all raise for the duration of the pipeline build."""
    import ray.data as rd
    from ray.data import Dataset

    rng = np.random.default_rng(6)
    vocab = [f"w{i:03d}" for i in range(120)]
    texts, ids = [], []
    for i in range(50):
        texts.append(" ".join(rng.choice(vocab, size=int(rng.integers(20, 40)))))
        ids.append(i)
    for j, src in enumerate([2, 7]):
        texts.append(texts[src])
        ids.append(100 + j)
    corpus = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})

    from lucene_solr_ray.stages.dedup import minhash_dedup

    real_take_all = Dataset.take_all

    def forbidden(self, *a, **kw):
        raise AssertionError("driver row materialization in minhash_dedup")

    want = {r["doc_id"] for r in minhash_dedup(rd.from_arrow(corpus), rounds=None).take_all()}

    monkeypatch.setattr(Dataset, "take_all", forbidden)
    try:
        kept_ds = minhash_dedup(rd.from_arrow(corpus), rounds=None)
    finally:
        monkeypatch.setattr(Dataset, "take_all", real_take_all)
    kept = {r["doc_id"] for r in kept_ds.take_all()}
    assert kept == want
    assert not ({100, 101} & kept)  # planted exact dups lost
