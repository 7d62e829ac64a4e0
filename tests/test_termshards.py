"""Sharded global term dictionary: lazy-load invariants + lookup parity.

Round-3 top item: ``terms_global`` is range-sharded so a query actor holds
O(touched shards), not O(vocab) (`BlockTreeTermsReader` .tip/.tim shape).
Unit layer checks the shard table against a flat reference; the e2e layer
builds a real index with a tiny shard size and requires identical query
results + bounded shard residency.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.termshards import (
    SHARD_INDEX,
    ShardedKeyMap,
    ShardedStringsView,
    ShardedTermTable,
    write_shard_index,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """5 shards x 40 terms with known df/ttf."""
    d = str(tmp_path_factory.mktemp("tg"))
    terms = sorted(f"t{i:04d}" for i in range(200))
    df = np.arange(1, 201, dtype=np.int64)
    ttf = df * 3
    for s in range(5):
        sl = slice(s * 40, (s + 1) * 40)
        pq.write_table(
            pa.table({"term": terms[sl], "df": df[sl], "ttf": ttf[sl]}),
            os.path.join(d, f"shard-{s:06d}-000000.parquet"),
        )
    write_shard_index(d)
    return {"dir": d, "terms": terms, "df": df, "ttf": ttf}


class TestShardTable:
    def test_index_and_get_parity(self, shard_dir):
        t = ShardedTermTable(shard_dir["dir"])
        assert len(t) == 200
        for i in [0, 39, 40, 41, 99, 199]:
            term = shard_dir["terms"][i]
            assert t.index(term) == i
            assert t.get(term, "df") == int(shard_dir["df"][i])
            assert t.get(term, "ttf") == int(shard_dir["ttf"][i])
        assert t.index("absent") == -1
        assert t.get("absent", "df", default=-7) == -7
        assert t.index("a-before-everything") == -1

    def test_point_lookup_loads_one_shard(self, shard_dir):
        t = ShardedTermTable(shard_dir["dir"])
        assert t.shards_loaded == 0  # resident index only, no data pages
        t.get("t0100", "df")
        assert t.shards_loaded == 1
        t.get("t0101", "df")  # same shard
        assert t.shards_loaded == 1

    def test_lru_bounds_residency(self, shard_dir):
        t = ShardedTermTable(shard_dir["dir"], max_cached=2)
        for term in ["t0000", "t0050", "t0100", "t0150", "t0199"]:
            t.get(term, "df")
        assert t.shards_loaded == 2

    def test_prefix_range_and_iter_cross_shard(self, shard_dir):
        t = ShardedTermTable(shard_dir["dir"])
        lo, hi = t.prefix_range("t00")  # t0000..t0099 spans shards 0-2
        assert (lo, hi) == (0, 100)
        assert list(t.iter_range(38, 43)) == shard_dir["terms"][38:43]
        assert t.values_slice("ttf", 38, 43).tolist() == shard_dir["ttf"][38:43].tolist()
        # full-prefix scan touches only the covering shards
        t2 = ShardedTermTable(shard_dir["dir"])
        list(t2.iter_range(*t2.prefix_range("t000")))  # t0000..t0009: shard 0
        assert t2.shards_loaded == 1

    def test_views_match_flat_reference(self, shard_dir):
        t = ShardedTermTable(shard_dir["dir"])
        v = ShardedStringsView(t)
        assert len(v) == 200 and v[77] == "t0077" and "t0077" in v
        assert list(v)[:3] == shard_dir["terms"][:3]
        m = ShardedKeyMap(t, "df")
        assert m.get("t0077") == int(shard_dir["df"][77]) and len(m) == 200

    def test_empty_shard_files_excluded(self, tmp_path):
        d = str(tmp_path)
        pq.write_table(pa.table({"term": ["a"], "df": [1], "ttf": [1]}),
                       os.path.join(d, "shard-000000-000000.parquet"))
        pq.write_table(pa.table({"term": pa.array([], type=pa.string()),
                                 "df": pa.array([], type=pa.int64()),
                                 "ttf": pa.array([], type=pa.int64())}),
                       os.path.join(d, "shard-000001-000000.parquet"))
        idx = write_shard_index(d)
        assert idx["files"] == ["shard-000000-000000.parquet"]
        assert ShardedTermTable(d).index("a") == 0


class TestShardedBuildE2E:
    def test_multi_shard_build_query_parity(self, ray_session, tmp_path, monkeypatch):
        """Force a tiny shard size: the build writes many shards; every query
        path (BM25, df lookups, prefix, suggest) matches the oracle with
        bounded shard residency."""
        import lucene_solr_ray.index.build as build_mod
        from lucene_solr_ray.fixtures import write_pages_parquet
        from lucene_solr_ray.index.reader import GlobalStats, LocalIndex
        from lucene_solr_ray.oracle import OracleIndex
        from lucene_solr_ray.query.ast import Evaluator, TermQ, top_k

        monkeypatch.setattr(build_mod, "TERMS_SHARD_ROWS", 64)
        root = str(tmp_path)
        files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=3)
        ix = os.path.join(root, "ix")
        build_mod.build_index(files, ix, rows_per_partition=64)
        shard_files = glob.glob(os.path.join(ix, "terms_global", "shard-*.parquet"))
        assert len(shard_files) > 3, "expected a multi-shard dictionary"
        assert os.path.exists(os.path.join(ix, "terms_global", SHARD_INDEX))

        stats = GlobalStats(ix)
        assert stats._tt is not None
        li = LocalIndex(ix)
        rows_df = pq.read_table(files).to_pandas()
        rows_df = (
            rows_df.sort_values(["url", "warc_ts", "doc_id"])
            .groupby("url", as_index=False)
            .last()
        )
        orc = OracleIndex(rows_df.to_dict("records"))
        for term in ["luko", "kalo", "zeph", "nothere"]:
            assert li.global_df("text", term) == orc.global_df("text", term)
            d, s = Evaluator(li).scored(TermQ(term))
            do, so = Evaluator(orc).scored(TermQ(term))
            assert top_k(d, s, 10) == top_k(do, so, 10)
        # point lookups keep residency bounded by the LRU, not vocab
        assert stats._tt.shards_loaded <= stats._tt.max_cached
