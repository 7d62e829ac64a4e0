"""Index artifact readers: partition-scoped TermSource implementations.

A loaded :class:`IndexPartition` is the analog of a Lucene ``SegmentReader``
(`lucene/core/src/java/org/apache/lucene/index/SegmentReader.java`): term
dict + postings + norms + doc-values for one partition, resident in RAM for
the lifetime of a query actor.  :class:`LocalIndex` merges all partitions in
one process (the single-node "control" of the differential tests,
``BaseDistributedSearchTestCase`` pattern).

Scale note: per-partition term lookup uses a Python dict (term -> row).  At
10^12-doc scale this becomes a sorted term array + binary search / FST; the
dict keeps identical semantics at test scale and is isolated behind
``postings()``.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq

from ..query.ast import FilterQ, RangeQ, TermSource
from ..stages.tokenize import field_term_key
from .postings import decode_docs_freqs, decode_positions


def _partition_files(root: str, pid: int) -> list[str]:
    return sorted(glob.glob(os.path.join(root, f"partition_id={pid}", "*.parquet")))


class GlobalStats:
    """Index-wide statistics shared by every scope (loaded once per process)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.max_doc = self.manifest["max_doc"]
        self.sum_dl = self.manifest["sum_dl"]
        self.extra_text_fields = tuple(self.manifest.get("extra_text_fields", ()))
        self.sum_dl_field = {
            f: self.manifest.get(f"sum_dl_{f}", 0) for f in self.extra_text_fields
        }
        t = pq.read_table(os.path.join(index_dir, "terms_global"))
        self.df = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        self.ttf = dict(zip(t["term"].to_pylist(), t["ttf"].to_pylist()))
        self.dicts: dict[str, list[str]] = {}
        for f in (*self.manifest["facet_fields"], *self.manifest["multi_facet_fields"]):
            p = os.path.join(index_dir, "dicts", f"{f}.parquet")
            if os.path.exists(p):
                self.dicts[f] = pq.read_table(p)["value"].to_pylist()
        # union-manifest support (incremental ingest): member roots + the
        # per-member old_ord -> global_ord OrdinalMaps (MultiDocValues analog)
        self._members: list[str] = self.manifest.get("members", [])
        self._member_of = {
            p["partition_id"]: p.get("member") for p in self.manifest["partitions"]
        }
        self._ordmaps: dict[tuple, np.ndarray | None] = {}

    def root_for(self, pid: int) -> str:
        mi = self._member_of.get(pid)
        return self._members[mi] if mi is not None else self.index_dir

    def ordmap_for(self, pid: int, field: str) -> np.ndarray | None:
        """member-local ord -> global ord (None for non-union indexes)."""
        mi = self._member_of.get(pid)
        if mi is None:
            return None
        key = (mi, field)
        if key not in self._ordmaps:
            p = os.path.join(self.index_dir, "ordmaps", f"m{mi}_{field}.parquet")
            self._ordmaps[key] = (
                np.asarray(pq.read_table(p)["global_ord"], dtype=np.int64)
                if os.path.exists(p)
                else None
            )
        return self._ordmaps[key]

    def ord_of(self, field: str, value: str) -> int:
        try:
            return self.dicts[field].index(value)
        except (KeyError, ValueError):
            return -1


class IndexPartition(TermSource):
    """One partition's artifacts, loaded into RAM (SegmentReader analog)."""

    def __init__(self, index_dir: str, pid: int, stats: GlobalStats):
        self.pid = pid
        self.stats = stats
        self.with_positions = stats.manifest["with_positions"]
        index_dir = stats.root_for(pid)  # union manifests link member artifacts

        tfiles = _partition_files(os.path.join(index_dir, "postings"), pid)
        terms_tbl = pq.read_table(tfiles) if tfiles else None
        self._cells: dict[str, dict] = {}
        if terms_tbl is not None:
            cols = terms_tbl.to_pydict()
            for i, term in enumerate(cols["term"]):
                self._cells[term] = {k: cols[k][i] for k in cols if k != "term"}

        dfiles = _partition_files(os.path.join(index_dir, "docmap"), pid)
        dm = pq.read_table(dfiles)
        order = np.argsort(np.asarray(dm["doc_id"].to_pylist(), dtype=np.int64))
        self.doc_ids = np.asarray(dm["doc_id"].to_pylist(), dtype=np.int64)[order]
        self.norms = np.asarray(dm["norm"].to_pylist(), dtype=np.uint8)[order]
        self.dls = np.asarray(dm["dl"].to_pylist(), dtype=np.int64)[order]
        self.field_norms: dict[str, np.ndarray] = {"text": self.norms}
        for f in stats.extra_text_fields:
            if f"norm_{f}" in dm.column_names:
                self.field_norms[f] = np.asarray(dm[f"norm_{f}"].to_pylist(), dtype=np.uint8)[order]
        self.columns: dict[str, np.ndarray] = {}
        self.list_columns: dict[str, list] = {}
        for name in dm.column_names:
            if name in ("doc_id", "norm", "dl", "partition_id"):
                continue
            vals = dm[name].to_pylist()
            if name.endswith("_ords") or isinstance(next((v for v in vals if v is not None), None), list):
                self.list_columns[name] = [vals[i] for i in order.tolist()]
            else:
                self.columns[name] = np.asarray(vals, dtype=object)[order]
                if name.endswith("_ord") or name == "dl":
                    self.columns[name] = self.columns[name].astype(np.int64)

    # -- TermSource -----------------------------------------------------------

    def postings(self, field, term):
        cell = self._cells.get(field_term_key(field, term))
        if cell is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return decode_docs_freqs(cell["docs"], cell["freqs"], cell["df"])

    def positions(self, field, term):
        if not self.with_positions:
            raise ValueError(
                "field indexed without positions; rebuild with with_positions=True "
                "to run phrase/span queries"
            )
        cell = self._cells.get(field_term_key(field, term))
        if cell is None:
            e = np.empty(0, dtype=np.int64)
            return e, e, []
        docs, tfs = decode_docs_freqs(cell["docs"], cell["freqs"], cell["df"])
        return docs, tfs, decode_positions(cell["positions"], tfs)

    def norm_bytes(self, field, doc_ids):
        idx = np.searchsorted(self.doc_ids, doc_ids)
        return self.field_norms.get(field, self.norms)[idx]

    def filter_docs(self, q):
        if isinstance(q, FilterQ):
            col = self.columns.get(q.field)
            if col is not None:
                return self.doc_ids[col == q.value]
            if q.field in self.stats.dicts and (q.field + "_ords") in self.list_columns:
                o = self.stats.ord_of(q.field, q.value)
                remap = self.stats.ordmap_for(self.pid, q.field)
                if remap is not None:
                    # global ord -> member-local (remap strictly increasing)
                    ml = int(np.searchsorted(remap, o))
                    o = ml if ml < len(remap) and remap[ml] == o else -1
                mask = np.fromiter(
                    (o in row for row in self.list_columns[q.field + "_ords"]),
                    dtype=bool,
                    count=len(self.doc_ids),
                )
                return self.doc_ids[mask]
            return np.empty(0, dtype=np.int64)
        if isinstance(q, RangeQ):
            if q.field == "dl":
                v = self.dls
            else:
                v = self.columns.get(q.field)
                if v is None:
                    return np.empty(0, dtype=np.int64)
                v = v.astype(np.float64)
            mask = np.ones(len(self.doc_ids), dtype=bool)
            if q.lo is not None:
                mask &= (v >= q.lo) if q.include_lo else (v > q.lo)
            if q.hi is not None:
                mask &= (v <= q.hi) if q.include_hi else (v < q.hi)
            return self.doc_ids[mask]
        raise TypeError(type(q))

    def all_docs(self):
        return self.doc_ids

    def global_df(self, field, term):
        return self.stats.df.get(field_term_key(field, term), 0)

    def global_stats(self, field):
        if field != "text" and field in self.stats.sum_dl_field:
            return self.stats.max_doc, self.stats.sum_dl_field[field]
        return self.stats.max_doc, self.stats.sum_dl

    def vocabulary(self, field):
        if field == "text":
            from ..stages.tokenize import FIELD_SEP

            return [t for t in self.stats.df if FIELD_SEP not in t]
        pref = field + "\x1f"
        return [t[len(pref):] for t in self.stats.df if t.startswith(pref)]

    # -- faceting support -----------------------------------------------------

    def facet_ords(self, field: str, hit_doc_ids: np.ndarray) -> np.ndarray:
        """GLOBAL ordinals (with repetition) contributed by the hit docs.

        In a union index the docmap stores member-local ordinals; the
        OrdinalMap remap (strictly increasing) lifts them to global ordinals
        (`MultiDocValues.OrdinalMap` analog)."""
        idx = np.searchsorted(self.doc_ids, hit_doc_ids)
        remap = self.stats.ordmap_for(self.pid, field)
        if field + "_ord" in self.columns:
            o = self.columns[field + "_ord"][idx].astype(np.int64)
            o = o[o >= 0]
            return remap[o] if remap is not None else o
        if field + "_ords" in self.list_columns:
            rows = self.list_columns[field + "_ords"]
            out = [rows[i] for i in idx.tolist() if rows[i]]
            if not out:
                return np.empty(0, dtype=np.int64)
            o = np.concatenate([np.asarray(r, dtype=np.int64) for r in out])
            return remap[o] if remap is not None else o
        raise KeyError(field)


class LocalIndex(TermSource):
    """All partitions merged in-process (single-node control)."""

    def __init__(self, index_dir: str):
        self.stats = GlobalStats(index_dir)
        pids = [p["partition_id"] for p in self.stats.manifest["partitions"]]
        self.parts = [IndexPartition(index_dir, pid, self.stats) for pid in pids]

    def _concat(self, pieces):
        pieces = [p for p in pieces if len(p)]
        if not pieces:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(pieces)

    def postings(self, field, term):
        ds, fs = [], []
        for p in self.parts:
            d, f = p.postings(field, term)
            ds.append(d)
            fs.append(f)
        return self._concat(ds), self._concat(fs)

    def positions(self, field, term):
        ds, fs, ps = [], [], []
        for p in self.parts:
            d, f, pl = p.positions(field, term)
            ds.append(d)
            fs.append(f)
            ps.extend(pl)
        return self._concat(ds), self._concat(fs), ps

    def norm_bytes(self, field, doc_ids):
        out = np.empty(len(doc_ids), dtype=np.uint8)
        for p in self.parts:
            m = (doc_ids >= p.doc_ids[0]) & (doc_ids <= p.doc_ids[-1]) if len(p.doc_ids) else np.zeros(len(doc_ids), bool)
            if m.any():
                out[m] = p.norm_bytes(field, doc_ids[m])
        return out

    def filter_docs(self, q):
        return self._concat([p.filter_docs(q) for p in self.parts])

    def all_docs(self):
        return self._concat([p.all_docs() for p in self.parts])

    def global_df(self, field, term):
        return self.stats.df.get(field_term_key(field, term), 0)

    def global_stats(self, field):
        if field != "text" and field in self.stats.sum_dl_field:
            return self.stats.max_doc, self.stats.sum_dl_field[field]
        return self.stats.max_doc, self.stats.sum_dl

    def vocabulary(self, field):
        if field == "text":
            from ..stages.tokenize import FIELD_SEP

            return [t for t in self.stats.df if FIELD_SEP not in t]
        pref = field + "\x1f"
        return [t[len(pref):] for t in self.stats.df if t.startswith(pref)]
