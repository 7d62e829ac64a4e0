"""Grouping / collapse / expand operators.

Re-specification of result grouping
(`lucene/grouping/src/java/org/apache/lucene/search/grouping/
TermSecondPassGroupingCollector.java`), CollapsingQParserPlugin and
ExpandComponent (`solr/core/src/java/org/apache/solr/handler/component/
ExpandComponent.java`) as ONE bucketed-shuffle Ray Data pattern: hash the
group key to a coarse bucket (bounds Python-call count), shuffle once, then
compute per-group top-k fully vectorized inside each bucket (lexsort +
boundary ranks) — no per-group Python, no driver state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import with_bucket


def grouped_topk(ds, key_col: str, sort_col: str, tie_col: str, k: int, *,
                 ascending: bool = False, buckets: int = 64, rank_col: str = "rk",
                 min_rank: int = 0):
    """Top-``k`` rows per ``key_col`` group ordered by (sort_col
    asc/desc, tie_col asc); emits ``rank_col`` (0-based within group).

    ``min_rank`` > 0 skips the group head — the ExpandComponent shape
    (collapse = rank 0; expand = ranks [1, k)).  Key column must be integer
    (hash-bucketed shuffle); one shuffle total.
    """

    def topk_in_bucket(g: pa.Table) -> pa.Table:
        key = np.asarray(g[key_col], dtype=np.int64)
        val = np.asarray(g[sort_col], dtype=np.float64)
        tie = np.asarray(g[tie_col], dtype=np.int64)
        sv = val if ascending else -val
        order = np.lexsort((tie, sv, key))
        k_s = key[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        rank = np.arange(len(order), dtype=np.int64) - starts[gid]
        keep = (rank >= min_rank) & (rank < k)
        out = g.drop_columns(["__b"]).take(pa.array(order[keep]))
        return out.append_column(rank_col, pa.array(rank[keep], type=pa.int64()))

    return (
        ds.map_batches(with_bucket(key_col, buckets), batch_format="pyarrow")
        .groupby("__b")
        .map_groups(topk_in_bucket, batch_format="pyarrow")
    )
