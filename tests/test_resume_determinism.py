"""Resume-from-checkpoint and parallelism-determinism invariants.

FIXTURES.md invariant 6: identical artifacts and results across parallelism
levels and across resume (the `segments_N` commit-point analog: stage markers
+ manifest written last)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.fixtures import write_pages_parquet
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.oracle import OracleIndex
from lucene_solr_ray.query.ast import BoolQ, Evaluator, TermQ, top_k


def _postings_fingerprint(index_dir):
    """Canonical content of the postings artifacts (order-independent)."""
    rows = []
    for f in sorted(glob.glob(os.path.join(index_dir, "postings", "**", "*.parquet"), recursive=True)):
        t = pq.read_table(f, columns=["term", "df", "ttf", "docs", "freqs"])
        rows.extend(
            (r["term"], r["df"], r["ttf"], r["docs"], r["freqs"]) for r in t.to_pylist()
        )
    rows.sort(key=lambda r: (r[0],))
    return rows


def test_resume_skips_completed_stages_and_commits_same_index(ray_session, tmp_path):
    root = str(tmp_path)
    files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=3)
    ix1 = os.path.join(root, "ix1")
    m1 = build_index(files, ix1, rows_per_partition=64)
    fp1 = _postings_fingerprint(ix1)

    # simulate a crash after tokenize: drop later stage outputs + markers
    for stage in ("dicts", "docmap", "postings", "stats"):
        os.remove(os.path.join(ix1, f"_stage_{stage}.json"))
    shutil.rmtree(os.path.join(ix1, "postings"))
    shutil.rmtree(os.path.join(ix1, "docmap"))
    os.remove(os.path.join(ix1, "manifest.json"))

    m2 = build_index(files, ix1, rows_per_partition=64, resume=True)
    assert _postings_fingerprint(ix1) == fp1
    assert m2["max_doc"] == m1["max_doc"]
    # the tokenized stage was NOT rerun (marker timestamp preserved)
    assert m2["lineage"]["tokenized"] == m1["lineage"]["tokenized"]


def test_identical_artifacts_across_build_configs(ray_session, tmp_path):
    """Different batching/bucketing => byte-identical posting content.

    (Full two-process 8-vs-32-CPU equality is exercised by `bench.py
    --scaling`; here we vary every scheduling-affecting knob we control and
    require identical artifacts, which is what makes that equality hold.)
    """
    root = str(tmp_path)
    files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=3)
    ixa, ixb = os.path.join(root, "a"), os.path.join(root, "b")
    build_index(files, ixa, rows_per_partition=64, tokenize_batch_size=32)
    build_index(files, ixb, rows_per_partition=64, tokenize_batch_size=512)
    assert _postings_fingerprint(ixa) == _postings_fingerprint(ixb)

    # and identical query results
    la, lb = LocalIndex(ixa), LocalIndex(ixb)
    for q in [TermQ("luko"), BoolQ(should=(TermQ("kalo"), TermQ("zeph")))]:
        da, sa = Evaluator(la).scored(q)
        db, sb = Evaluator(lb).scored(q)
        assert top_k(da, sa, 20) == top_k(db, sb, 20)


def test_per_partition_resume_reencodes_only_missing(ray_session, tmp_path):
    """Delete ONE partition's postings file; rerun; only that partition is
    re-encoded (others untouched byte-for-byte, checked via mtime+content)."""
    root = str(tmp_path)
    files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=3)
    ix = os.path.join(root, "ix")
    build_index(files, ix, rows_per_partition=64)
    pdirs = sorted(glob.glob(os.path.join(ix, "postings", "partition_id=*")))
    assert len(pdirs) >= 3
    victim = os.path.join(pdirs[1], "postings.parquet")
    victim_content = open(victim, "rb").read()
    keep_stats = {
        d: os.stat(os.path.join(d, "postings.parquet")).st_mtime_ns
        for d in pdirs
        if d != pdirs[1]
    }
    os.remove(victim)
    for stage in ("postings", "stats"):
        os.remove(os.path.join(ix, f"_stage_{stage}.json"))
    os.remove(os.path.join(ix, "manifest.json"))

    m2 = build_index(files, ix, rows_per_partition=64, resume=True)
    # victim re-encoded to identical bytes; all others not rewritten
    assert open(victim, "rb").read() == victim_content
    for d, mtime in keep_stats.items():
        assert os.stat(os.path.join(d, "postings.parquet")).st_mtime_ns == mtime, d
    assert m2["lineage"]["postings"]["partitions_encoded"] == 1
    assert m2["lineage"]["postings"]["partitions_skipped"] == len(pdirs) - 1


def test_manifest_records_lineage(pages_corpus):
    man = json.load(open(os.path.join(pages_corpus["index_dir"], "manifest.json")))
    assert set(man["lineage"]) == {
        "tokenized", "dicts", "docmap", "stored", "postings", "stats",
    }
    assert all("secs" in v for v in man["lineage"].values())
    assert man["lineage"]["tokenized"]["fingerprint"]["input"]
    # per-partition row counts recorded (resume/lineage granularity)
    assert sum(p["rows"] for p in man["partitions"]) == man["max_doc"]
