"""Stage-6 range-merge regime (zero-shuffle global term stats) vs the
single-task regime, on a real built index.

The merge regime is the scale path (BASELINE.md round-5: 2.6x the single
task at 8 CPUs on a 9.6M-cell corpus) but gate-scale corpora stay under its
STATS_MERGE_MIN_CELLS threshold, so this test drives `_merge_term_stats`
directly: rewrite the suite index's postings with small row groups + exact
first-term sidecars, run the merge, and require the concatenated
terms_global stream to equal the single-task regime's output table exactly
(same terms, same df/ttf, same global order) with range-disjoint shards.
"""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_terms_global(tg_dir):
    from lucene_solr_ray.index.termshards import SHARD_INDEX

    with open(os.path.join(tg_dir, SHARD_INDEX)) as fh:
        idx = json.load(fh)
    tables = [pq.read_table(os.path.join(tg_dir, f)) for f in idx["files"]]
    return idx, pa.concat_tables(tables) if tables else pa.table(
        {"term": pa.array([], pa.string())}
    )


@pytest.fixture(scope="module")
def merged_tg(pages_corpus, tmp_path_factory):
    from lucene_solr_ray.index.build import _merge_term_stats
    from lucene_solr_ray.index.termshards import write_shard_index

    index_dir = pages_corpus["index_dir"]
    work = str(tmp_path_factory.mktemp("stats_merge"))

    # re-layout the postings with tiny row groups + exact sidecars so the
    # range pruning actually has boundaries to work with at fixture scale
    rg_rows = 64
    post_files, file_firsts, n_cells = [], {}, 0
    for src in sorted(
        glob.glob(os.path.join(index_dir, "postings", "partition_id=*", "postings.parquet"))
    ):
        pid = os.path.basename(os.path.dirname(src))
        d = os.path.join(work, "postings", pid)
        os.makedirs(d)
        t = pq.read_table(src)
        dst = os.path.join(d, "postings.parquet")
        pq.write_table(t, dst, row_group_size=rg_rows)
        firsts = [t["term"][i].as_py() for i in range(0, t.num_rows, rg_rows)]
        with open(os.path.join(d, "_rg_firsts.json"), "w") as fh:
            json.dump(firsts, fh)
        post_files.append(dst)
        file_firsts[dst] = firsts
        n_cells += t.num_rows

    avg_rgs = sum(len(v) for v in file_firsts.values()) // len(post_files)
    assert avg_rgs >= 4, "fixture must exercise real row-group pruning"

    tg_dir = os.path.join(work, "terms_global")
    os.makedirs(tg_dir)
    _merge_term_stats(post_files, file_firsts, n_cells, avg_rgs, tg_dir)
    write_shard_index(tg_dir)
    return {"tg_dir": tg_dir, "index_dir": index_dir}


def test_merge_equals_single_task_regime(merged_tg):
    # the suite index itself was built through the single-task regime
    # (fixture corpus is far below STATS_MERGE_MIN_CELLS)
    _, single = _read_terms_global(os.path.join(merged_tg["index_dir"], "terms_global"))
    _, merged = _read_terms_global(merged_tg["tg_dir"])
    assert merged.num_rows == single.num_rows
    for col in ("term", "df", "ttf"):
        assert merged[col].equals(single[col]), col


def test_merge_shards_range_disjoint_and_ordered(merged_tg):
    idx, merged = _read_terms_global(merged_tg["tg_dir"])
    assert len(idx["files"]) > 1, "merge regime must fan out into multiple shards here"
    terms = merged["term"].to_pylist()
    assert terms == sorted(terms)
    assert idx["first"] == sorted(idx["first"])


def test_sidecar_written_by_fresh_build(pages_corpus):
    # stage 5 writes the exact first-term sidecar next to every postings file
    for src in sorted(
        glob.glob(
            os.path.join(pages_corpus["index_dir"], "postings", "partition_id=*", "postings.parquet")
        )
    ):
        side = os.path.join(os.path.dirname(src), "_rg_firsts.json")
        assert os.path.exists(side), side
        with open(side) as fh:
            firsts = json.load(fh)
        md = pq.ParquetFile(src).metadata
        assert len(firsts) == md.num_row_groups
        t = pq.read_table(src, columns=["term"])
        assert firsts[0] == t["term"][0].as_py()
