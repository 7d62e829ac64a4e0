"""Join operators.

The reference has only query-time semi-joins and block-joins (SURVEY.md
§2.4); a training-data engine also needs general equi-joins.  Two shapes:

* :func:`broadcast_semi_join` — small key side broadcast via ``ray.put``,
  filter inside ``map_batches`` (no shuffle; `JoinQParserPlugin` analog).
* :func:`hash_join` — both sides large: explicit partitioned hash join
  (the portable Ray Data pattern): add ``bucket = hash(key) % B`` to both
  sides, tag the side, union, ``groupby(bucket)``, pandas merge per bucket.
  B bounds the per-task memory; salt hot keys upstream if a single key
  dominates (skew note in SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..hashing import bucket_column


def broadcast_semi_join(ds, keys, key_col: str, *, anti: bool = False):
    """Keep rows whose key is (not, for anti) in the broadcast key set.

    The key set is shipped ONCE as an Arrow array (``ray.put``); each batch
    filters with the vectorized C++ ``is_in`` kernel — no per-row Python.
    ``keys`` may be a numpy or Arrow array (kept columnar end-to-end — the
    50M-loser regime never becomes Python objects) or any iterable."""
    import numpy as np

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(keys, pa.Array):
        arr = keys.take(pc.array_sort_indices(keys))
    elif isinstance(keys, np.ndarray):
        arr = pa.array(np.sort(keys))
    else:
        arr = pa.array(sorted(keys))
    ref = ray.put(arr)

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[key_col], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        # null keys are never "in" the set: round-1 semantics preserved
        return t.filter(pc.fill_null(mask, anti))

    return ds.map_batches(filt, batch_format="pyarrow")


_KEYBUCKET_CACHE: dict = {}


def _load_key_bucket(spill_dir: str, bucket: int):
    """Per-worker-process LRU-ish cache of one bucket's key array (Ray
    reuses worker processes across map tasks, so hot buckets load once)."""
    import glob as _g
    import os as _os

    ck = (spill_dir, bucket)
    hit = _KEYBUCKET_CACHE.get(ck)
    if hit is not None:
        return hit
    import pyarrow.parquet as _pq

    files = _g.glob(_os.path.join(spill_dir, f"__b={bucket}", "*.parquet"))
    arr = (
        _pq.read_table(files).column(0).combine_chunks()
        if files
        else pa.array([], type=pa.int64())
    )
    if len(_KEYBUCKET_CACHE) > 64:
        _KEYBUCKET_CACHE.clear()
    _KEYBUCKET_CACHE[ck] = arr
    return arr


def partitioned_anti_join(ds, keys_ds, key_col: str, spill_dir: str, *,
                          n_buckets: int = 256):
    """Anti-join for key sets too large to broadcast — the loser-set regime
    documented in SCALE.md: the skinny key side is written Parquet
    hive-partitioned by ``key % n_buckets`` and each downstream task loads
    ONLY the bucket files its batch touches (worker-process cache).  The
    DATA side is never shuffled and the driver never holds a key; per-task
    extra memory is O(|keys| / n_buckets * touched buckets).

    ``keys_ds`` is a Dataset with one int64 column named ``key_col``.
    Result is identical to ``broadcast_semi_join(ds, keys, anti=True)``.
    """

    def bucketize(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[key_col], dtype=np.int64)
        return pa.table(
            {key_col: t[key_col], "__b": pa.array(ids % n_buckets, type=pa.int64())}
        )

    keys_ds.map_batches(bucketize, batch_format="pyarrow").write_parquet(
        spill_dir, partition_cols=["__b"], mode="overwrite"
    )

    def drop(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[key_col], dtype=np.int64)
        if len(ids) == 0:
            return t
        bks = ids % n_buckets
        keep = np.ones(len(ids), dtype=bool)
        for b in np.unique(bks).tolist():
            keys = _load_key_bucket(spill_dir, int(b))
            if len(keys) == 0:
                continue
            m = bks == b
            hit = pc.is_in(pa.array(ids[m]), value_set=keys).to_numpy(
                zero_copy_only=False
            )
            keep[np.flatnonzero(m)[hit]] = False
        return t.filter(pa.array(keep))

    return ds.map_batches(drop, batch_format="pyarrow")


def hash_join(
    left,
    right,
    left_key: str,
    right_key: str,
    *,
    buckets: int = 32,
    how: str = "inner",
):
    """Partitioned hash join of two Datasets -> Dataset of joined rows.

    Schema: all left columns + all right columns (right key column dropped
    if names collide).  ``how``: inner / left.
    """
    l_names = left.schema().names
    r_names = right.schema().names

    def tag(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = bucket_column(t[key], buckets)
            t = t.append_column("__bucket", pa.array(b, type=pa.int64()))
            return t.append_column("__side", pa.array([side] * t.num_rows))

        return fn

    lt = left.map_batches(tag("L", left_key), batch_format="pyarrow")
    rt = right.map_batches(tag("R", right_key), batch_format="pyarrow")

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, ValueError, pa.lib.ArrowNotImplementedError):
            return pa.string()

    l_schema = {n: _pa_type(t) for n, t in zip(left.schema().names, left.schema().types)}
    r_schema = {n: _pa_type(t) for n, t in zip(right.schema().names, right.schema().types)}

    def pad(missing: dict):
        def fn(t: pa.Table) -> pa.Table:
            for n, typ in missing.items():
                if n not in t.column_names:
                    t = t.append_column(n, pa.nulls(t.num_rows, type=typ))
            return t

        return fn

    lt = lt.map_batches(pad(r_schema), batch_format="pyarrow")
    rt = rt.map_batches(pad(l_schema), batch_format="pyarrow")
    ordered = sorted(set(l_names) | set(r_names)) + ["__bucket", "__side"]
    lt = lt.select_columns(ordered)
    rt = rt.select_columns(ordered)

    def join_bucket(group: pa.Table) -> pa.Table:
        # Arrow-native per-bucket join (no pandas detour; int columns keep
        # their types through the union's null padding).  Acero joins only
        # SKINNY (row-index, key) tables — payload columns of ANY type
        # (incl. list<float> embeddings Acero can't carry as non-key
        # fields) are assembled afterwards with ``take`` on the match
        # indices; a null right index yields null right columns, which is
        # exactly the left-outer contract.
        lmask = pc.equal(group["__side"], "L")
        gl = group.filter(lmask).select(list(l_names))
        gr = group.filter(pc.invert(lmask)).select(list(r_names))
        # Acero requires identical key types; when they differ (int32 vs
        # int64, string vs large_string) cast ONLY the skinny join keys to
        # their promoted common type — output columns are assembled from the
        # original tables, so both sides keep their native dtypes.
        lk_col, rk_col = gl[left_key], gr[right_key]
        if lk_col.type != rk_col.type:
            common = pa.unify_schemas(
                [pa.schema([("k", lk_col.type)]), pa.schema([("k", rk_col.type)])],
                promote_options="permissive",
            ).field("k").type
            lk_col = pc.cast(lk_col, common)
            rk_col = pc.cast(rk_col, common)
        lk = pa.table(
            {"__li": pa.array(np.arange(gl.num_rows, dtype=np.int64)),
             "__lk": lk_col}
        )
        rk = pa.table(
            {"__ri": pa.array(np.arange(gr.num_rows, dtype=np.int64)),
             "__rk": rk_col}
        )
        m = lk.join(
            rk, keys="__lk", right_keys="__rk",
            join_type="inner" if how == "inner" else "left outer",
        )
        li, ri = m["__li"], m["__ri"]
        cols, names = [], []
        left_out = gl.take(li)
        for n in l_names:
            names.append(n)
            cols.append(left_out[n])
        for n in r_names:
            if n == right_key and right_key == left_key:
                continue  # coalesced into the left key column
            # the right key rides along like any other right column (take
            # with null indices yields nulls), keeping the RIGHT table's own
            # dtype — rebuilding it from the left key would silently retype
            # it when key dtypes differ (e.g. int32 vs int64)
            col = gr[n].take(ri)
            names.append(n if n not in set(l_names) else f"{n}_r")
            cols.append(col)
        return pa.table(dict(zip(names, cols)))

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
