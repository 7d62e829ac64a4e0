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


def test_sharded_build_never_unioned_on_driver(two_builds):
    """With threshold=0 every field must take the distributed path: the stage
    marker records the regime per field, and the metadata-only decision means
    the driver union list is empty (no per-block value list ever shipped)."""
    import json

    with open(os.path.join(two_builds["sharded"], "_stage_dicts.json")) as fh:
        marker = json.load(fh)
    assert set(marker["sharded_fields"]) >= {"host", "tld", "lang", "links_sim"}
    assert marker["driver_union_fields"] == []
    # decision inputs are counts, recorded for auditability
    assert all(isinstance(v, int) for v in marker["distinct_upper_bounds"].values())


def test_sharded_ordinal_mapper_matches_index_in(two_builds):
    """Lazy per-shard ordinal mapping == one-shot index_in over the full
    dictionary, including nulls and out-of-dictionary values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lucene_solr_ray.index.build import read_dict_table
    from lucene_solr_ray.index.termshards import ShardedOrdinalMapper

    ix = two_builds["sharded"]
    for f in ("host", "links_sim"):
        full = read_dict_table(ix, f)["value"].combine_chunks()
        m = ShardedOrdinalMapper(os.path.join(ix, "dicts", f), max_cached=2)
        vals = pa.array(
            list(full.to_pylist()[:50]) + [None, "zz-not-in-dict", "", "aaa"],
            type=pa.string(),
        )
        expect = pc.fill_null(pc.cast(pc.index_in(vals, value_set=full), pa.int32()), -1)
        got = m.map_array(vals)
        assert got.to_pylist() == expect.to_pylist(), f
        assert m.shards_loaded <= 2  # LRU held, not the whole dictionary


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
