"""Pure-Python single-process oracle (conformance target for the Ray engine).

Stands in for the JVM reference in CI (SURVEY.md §5): dict-of-lists inverted
index + the SAME float-exact evaluator as the distributed engine, plus exact
facet counts with the reference ordering.  Differential tests assert the Ray
pipeline's artifacts and results equal this oracle on deterministic fixtures
(the pattern of ``BaseDistributedSearchTestCase.compareResponses`` and
``SparseFacetTest.java:251-463``).
"""

from __future__ import annotations

import numpy as np

from .analysis.tokenizer import analyze
from .query.ast import Evaluator, FilterQ, RangeQ, TermSource, top_k
from .smallfloat import encode_norm
from .stages.tokenize import FIELD_SEP, field_term_key


class OracleIndex(TermSource):
    """In-memory single-node index over rows with a ``text`` field.

    ``rows``: list of dicts with keys ``doc_id``, ``text`` and arbitrary
    keyword/numeric fields (used by filters and facets).  Multi-valued
    keyword fields are lists.
    """

    def __init__(self, rows: list[dict], text_field: str = "text", extra_fields: tuple = ()):
        rows = sorted(rows, key=lambda r: r["doc_id"])
        self.rows = rows
        self.text_field = text_field
        self.extra_fields = tuple(extra_fields)
        self.doc_ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
        self._post: dict[str, list[tuple[int, int, list[int]]]] = {}
        self.field_norms: dict[str, np.ndarray] = {}
        self.sum_ttf_field: dict[str, int] = {}
        for f, src in [("text", text_field)] + [(f, f) for f in self.extra_fields]:
            dls = []
            sum_ttf = 0
            for r in rows:
                toks = analyze(r.get(src) or "")
                dls.append(len(toks))
                sum_ttf += len(toks)
                per: dict[str, list[int]] = {}
                for term, pos in toks:
                    per.setdefault(field_term_key(f, term), []).append(pos)
                for term, plist in per.items():
                    self._post.setdefault(term, []).append(
                        (int(r["doc_id"]), len(plist), plist)
                    )
            self.field_norms[f] = encode_norm(np.array(dls, dtype=np.int64))
            self.sum_ttf_field[f] = sum_ttf
            if f == "text":
                self.dls = np.array(dls, dtype=np.int64)
        self.norms = self.field_norms["text"]
        self.max_doc = len(rows)
        self.sum_ttf = self.sum_ttf_field["text"]

    # -- TermSource -----------------------------------------------------------

    def postings(self, field, term):
        pl = self._post.get(field_term_key(field, term), [])
        return (
            np.array([d for d, _, _ in pl], dtype=np.int64),
            np.array([tf for _, tf, _ in pl], dtype=np.int64),
        )

    def positions(self, field, term):
        pl = self._post.get(field_term_key(field, term), [])
        docs = np.array([d for d, _, _ in pl], dtype=np.int64)
        tfs = np.array([tf for _, tf, _ in pl], dtype=np.int64)
        return docs, tfs, [np.array(p, dtype=np.int64) for _, _, p in pl]

    def norm_bytes(self, field, doc_ids):
        idx = np.searchsorted(self.doc_ids, doc_ids)
        return self.field_norms.get(field, self.norms)[idx]

    def filter_docs(self, q):
        out = []
        if isinstance(q, FilterQ):
            for r in self.rows:
                v = r.get(q.field)
                if (isinstance(v, list) and q.value in v) or v == q.value:
                    out.append(r["doc_id"])
        elif isinstance(q, RangeQ):
            for i, r in enumerate(self.rows):
                # dl is an index-time statistic: serve it from the oracle's
                # own analysis pass, like the engine serves it from docmap
                v = int(self.dls[i]) if q.field == "dl" else r.get(q.field)
                if v is None:
                    continue
                if q.lo is not None and (v < q.lo or (v == q.lo and not q.include_lo)):
                    continue
                if q.hi is not None and (v > q.hi or (v == q.hi and not q.include_hi)):
                    continue
                out.append(r["doc_id"])
        return np.array(sorted(out), dtype=np.int64)

    def all_docs(self):
        return self.doc_ids

    def global_df(self, field, term):
        return len(self._post.get(field_term_key(field, term), []))

    def global_stats(self, field):
        return self.max_doc, self.sum_ttf_field.get(field, self.sum_ttf)

    def vocabulary(self, field):
        if field == "text":
            return [t for t in self._post if FIELD_SEP not in t]
        pref = field + FIELD_SEP
        return [t[len(pref):] for t in self._post if t.startswith(pref)]

    # -- search / facets ------------------------------------------------------

    def search(self, query, k: int = 10) -> list[tuple[float, int]]:
        docs, scores = Evaluator(self).scored(query)
        return top_k(docs, scores, k)

    def facet(
        self,
        hit_doc_ids,
        field: str,
        limit: int = 100,
        offset: int = 0,
        mincount: int = 0,
        prefix: str | None = None,
    ) -> list[tuple[str, int]]:
        """Exact facet counts ordered (count desc, ordinal asc); ordinal =
        rank in the UTF-8-byte-sorted value dictionary (ValueCounter.java:190
        packing (count<<32)+(MAX_VALUE-ord))."""
        hits = set(int(d) for d in np.asarray(hit_doc_ids).tolist())
        counts: dict[str, int] = {}
        # dictionary = all values in the index (ordinals exist independent of hits)
        vocab = set()
        for r in self.rows:
            v = r.get(field)
            if isinstance(v, np.ndarray):
                v = v.tolist()
            vals = v if isinstance(v, list) else ([] if v is None else [v])
            for val in vals:
                vocab.add(val)
                if int(r["doc_id"]) in hits:
                    counts[val] = counts.get(val, 0) + 1
        ordered_vocab = sorted(vocab, key=lambda s: s.encode("utf-8"))
        ords = {v: i for i, v in enumerate(ordered_vocab)}
        items = [
            (v, counts.get(v, 0))
            for v in ordered_vocab
            if counts.get(v, 0) >= mincount
            and (prefix is None or v.startswith(prefix))
        ]
        items.sort(key=lambda vc: (-vc[1], ords[vc[0]]))
        return items[offset : offset + limit]
