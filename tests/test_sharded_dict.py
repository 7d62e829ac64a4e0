"""Sharded (distributed) facet-dictionary build == driver-union build."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def two_builds(ray_session, pages_corpus, tmp_path_factory):
    """Same corpus built twice: normal dicts vs forced-sharded dicts."""
    from lucene_solr_ray.index.build import build_index

    root = str(tmp_path_factory.mktemp("sharded"))
    ix = os.path.join(root, "ix_sharded")
    build_index(
        pages_corpus["files"],
        ix,
        rows_per_partition=128,
        multi_facet_fields=("links_sim",),
        dict_shard_threshold=0,  # force the distributed path for every field
    )
    return {"normal": pages_corpus["index_dir"], "sharded": ix}


def test_sharded_dict_values_identical(two_builds):
    from lucene_solr_ray.index.build import read_dict_table

    for f in ("host", "tld", "lang", "links_sim"):
        a = read_dict_table(two_builds["normal"], f)
        b = read_dict_table(two_builds["sharded"], f)
        assert a is not None and b is not None, f
        assert a["value"].to_pylist() == b["value"].to_pylist(), f
        # sharded layout really is multi-file-capable (dir, not single file)
        assert os.path.isdir(os.path.join(two_builds["sharded"], "dicts", f))


def test_sharded_shards_are_globally_sorted(two_builds):
    files = sorted(glob.glob(os.path.join(two_builds["sharded"], "dicts", "links_sim", "*.parquet")))
    assert files
    vals = pq.read_table(files)["value"].to_pylist()
    assert vals == sorted(vals, key=lambda s: s.encode())


def test_sharded_index_queries_identical(ray_session, two_builds, oracle_index):
    """Facets + ordinals derived from the sharded dictionary match the
    normal build's query results exactly."""
    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.query.ast import Evaluator, FilterQ, TermQ, top_k

    a = LocalIndex(two_builds["normal"])
    b = LocalIndex(two_builds["sharded"])
    for q in [TermQ("luko"), FilterQ("host", a.stats.dicts["host"][0])]:
        da, sa = Evaluator(a).scored(q)
        db, sb = Evaluator(b).scored(q)
        assert top_k(da, sa, 20) == top_k(db, sb, 20), q
    # facet ords line up with the same global dictionary
    import numpy as np

    for f in ("host", "lang"):
        oa = np.sort(np.concatenate([p.facet_ords(f, p.doc_ids) for p in a.parts]))
        ob = np.sort(np.concatenate([p.facet_ords(f, p.doc_ids) for p in b.parts]))
        assert np.array_equal(oa, ob), f
