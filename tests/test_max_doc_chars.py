"""Giant-document guard: build_index(max_doc_chars=K) must equal a build
over pre-truncated input (same artifacts), and the truncation must be
code-point based (unicode-safe)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.reader import GlobalStats


def _docs_table():
    return pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "alpha beta " * 50,          # long doc: gets truncated
            "short döc ünïcode",          # multibyte chars near any cut
            None,
        ], type=pa.string()),
        "lang": pa.array(["en", "de", "en"]),
    })


def _build(tmp, name, tbl, **kw):
    src = os.path.join(tmp, f"{name}.parquet")
    pq.write_table(tbl, src)
    ix = os.path.join(tmp, f"ix_{name}")
    build_index([src], ix, rows_per_partition=128, extract_html=False,
                dedup_url=False, analyzer="standard", facet_fields=("lang",),
                resume=False, **kw)
    return ix


def test_capped_build_equals_pretruncated_build(tmp_path):
    tmp = str(tmp_path)
    k = 40
    capped_ix = _build(tmp, "capped", _docs_table(), max_doc_chars=k)

    pre = _docs_table()
    cut = pa.array(
        [None if t is None else t[:k] for t in pre["text"].to_pylist()],
        type=pa.string(),
    )
    pre = pre.set_column(pre.column_names.index("text"), "text", cut)
    ref_ix = _build(tmp, "pretrunc", pre)

    # identical term stats + norms
    a, b = GlobalStats(capped_ix), GlobalStats(ref_ix)
    assert a.sum_dl == b.sum_dl and a.max_doc == b.max_doc
    import glob

    def _dm(ix):
        return pq.read_table(
            sorted(glob.glob(os.path.join(ix, "docmap", "partition_id=0", "*.parquet")))
        ).select(["doc_id", "dl", "norm"])

    assert _dm(capped_ix).equals(_dm(ref_ix))
    # postings bytes identical
    ta = pq.read_table(os.path.join(capped_ix, "postings", "partition_id=0", "postings.parquet"))
    tb = pq.read_table(os.path.join(ref_ix, "postings", "partition_id=0", "postings.parquet"))
    assert ta.equals(tb)


def test_cap_is_codepoint_safe(tmp_path):
    # cutting inside "döc ünïcode" must not split a multibyte char
    tbl = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["ö" * 100], type=pa.string()),
        "lang": pa.array(["de"]),
    })
    ix = _build(str(tmp_path), "uni", tbl, max_doc_chars=7)
    import glob

    dm = pq.read_table(
        sorted(glob.glob(os.path.join(ix, "docmap", "partition_id=0", "*.parquet")))
    )
    assert dm["dl"].to_pylist() == [1]  # one 7-char token survives
