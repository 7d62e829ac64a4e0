"""K-means document clustering gates: planted-topic purity, determinism,
and driver-state shape (centroids only)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


TOPICS = {
    0: "apple banana fruit orchard harvest ripe juice cider",
    1: "tensor gradient matrix optimizer training epoch loss",
    2: "harbor vessel anchor sailing tide mooring dock marina",
}


@pytest.fixture(scope="module")
def planted(ray_session):
    import ray.data as rd

    rows = []
    rng = np.random.default_rng(7)
    for i in range(90):
        topic = i % 3  # docs 0,1,2 cover all three topics (seed determinism)
        words = TOPICS[topic].split()
        text = " ".join(rng.choice(words, size=30).tolist())
        rows.append({"doc_id": i, "text": text, "topic": topic})
    return rd.from_items(rows), {r["doc_id"]: r["topic"] for r in rows}


def test_planted_topics_pure(planted):
    from lucene_solr_ray.stages.clustering import kmeans_docs

    ds, truth = planted
    out, centroids = kmeans_docs(ds, k=3, dim=128, iters=10)
    rows = out.take_all()
    assert len(rows) == 90
    assert centroids.shape == (3, 128)
    # every truth-topic maps to exactly one cluster and vice versa
    mapping: dict = {}
    for r in rows:
        t = truth[r["doc_id"]]
        mapping.setdefault(t, set()).add(r["cluster"])
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_deterministic(planted):
    from lucene_solr_ray.stages.clustering import kmeans_docs

    ds, _ = planted
    a, ca = kmeans_docs(ds, k=3, dim=64, iters=5)
    b, cb = kmeans_docs(ds, k=3, dim=64, iters=5)
    assert (ca == cb).all()
    ra = {r["doc_id"]: r["cluster"] for r in a.take_all()}
    rb = {r["doc_id"]: r["cluster"] for r in b.take_all()}
    assert ra == rb


def test_featurize_unit_norm(ray_session):
    from lucene_solr_ray.stages.clustering import featurize_batch, _batch_matrix

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["hello world hello", ""])})
    out = featurize_batch(t, dim=32)
    m = _batch_matrix(out, 32)
    assert abs(float(np.linalg.norm(m[0])) - 1.0) < 1e-6
    assert float(np.linalg.norm(m[1])) == 0.0


def test_too_few_docs_raises(ray_session):
    import ray.data as rd

    from lucene_solr_ray.stages.clustering import kmeans_docs

    ds = rd.from_items([{"doc_id": 0, "text": "only one doc"}])
    with pytest.raises(ValueError):
        kmeans_docs(ds, k=3, dim=32, iters=2)
