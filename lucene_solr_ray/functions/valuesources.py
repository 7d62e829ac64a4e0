"""Function-query value sources beyond plain math kernels.

Reference registry: `solr/core/src/java/org/apache/solr/search/
ValueSourceParser.java` — ``strdist`` (:359), ``ms`` (:574), ``joindf``
(:295, `JoinDocFreqValueSource.java`).  All vectorized: strdist is a
whole-column Wagner-Fischer DP (numpy ops over all rows per cell), ms is
Arrow timestamp arithmetic, joindf is a broadcast value->df dictionary
lookup inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import _flat_bytes


def levenshtein_to(col, target: str) -> np.ndarray:
    """Edit distance of every string in an Arrow column to ``target``.

    Byte-level Wagner-Fischer, vectorized ACROSS rows: the DP table is
    (rows, maxlen+1) and each cell update is one numpy op — ~|target|*maxlen
    vector ops total, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, off = _flat_bytes(col)
    lens = np.diff(off)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    L = int(lens.max()) if len(lens) else 0
    t = np.frombuffer(target.encode("utf-8"), dtype=np.uint8)
    T = len(t)
    mat = np.zeros((n, max(L, 1)), dtype=np.uint8)
    if len(flat):
        row_of = np.repeat(np.arange(n), lens)
        local = np.arange(len(flat)) - np.repeat(off[:-1], lens)
        mat[row_of, local] = flat
    dp = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
    for i in range(1, T + 1):
        new = np.empty_like(dp)
        new[:, 0] = i
        for j in range(1, L + 1):
            cost = (mat[:, j - 1] != t[i - 1]).astype(np.int64)
            new[:, j] = np.minimum(
                np.minimum(dp[:, j] + 1, new[:, j - 1] + 1), dp[:, j - 1] + cost
            )
        dp = new
    return dp[np.arange(n), lens]


def ms_between(ts_col, anchor_iso: str) -> pa.Array:
    """``ms(a, b)`` value source: milliseconds between a timestamp column and
    a fixed anchor (column minus anchor, the Solr argument order)."""
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S" if "T" in anchor_iso else "%Y-%m-%d"
    anchor = datetime.strptime(anchor_iso.rstrip("Z"), fmt)
    if isinstance(ts_col, pa.ChunkedArray):
        ts_col = ts_col.combine_chunks()
    # work in the column's NATIVE unit (an Arrow cast ns->us would refuse to
    # truncate sub-microsecond values); floor-divide to ms at the end so
    # every unit agrees (millisecond epochs round toward -inf, Date semantics)
    unit = ts_col.type.unit
    native = np.asarray(pc.cast(ts_col, pa.int64()))
    anchor_s = (anchor - datetime(1970, 1, 1)).total_seconds()
    per_ms = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    if unit == "s":
        return pa.array((native - int(anchor_s)) * 1000, type=pa.int64())
    anchor_native = int(round(anchor_s * 1000)) * (per_ms)
    return pa.array(np.floor_divide(native - anchor_native, per_ms), type=pa.int64())


def geodist_km(lat_col, lon_col, lat0: float, lon0: float) -> pa.Array:
    """``geodist`` value source (`ValueSourceParser.java:304`,
    `HaversineConstFunction`): great-circle distance in km from a fixed
    point, vectorized haversine over numpy."""
    lat = np.radians(np.asarray(lat_col, dtype=np.float64))
    lon = np.radians(np.asarray(lon_col, dtype=np.float64))
    la0 = np.radians(lat0)
    lo0 = np.radians(lon0)
    dlat = lat - la0
    dlon = lon - lo0
    a = np.sin(dlat / 2) ** 2 + np.cos(la0) * np.cos(lat) * np.sin(dlon / 2) ** 2
    d = 2 * 6371.0087714 * np.arcsin(np.sqrt(a))  # GeoUtils.EARTH_MEAN_RADIUS
    return pa.array(d, type=pa.float64())


def calc_bbox_deg(lat0: float, lon0: float, d_km: float) -> tuple:
    """Bounding box around a point at great-circle distance ``d_km``
    (`lucene/spatial/.../DistanceUtils.java` ``calcBoxByDistFromPt`` /
    Solr's ``{!bbox}`` via `BBoxField` / `SpatialUtils.calcBoxByDistFromPt`):
    latitude span is the angular distance; the longitude half-width is
    ``asin(sin(dist)/cos(lat))`` (widest-circle crossing, NOT the width at
    lat0 — the box must contain the whole circle).  Crossing a pole opens
    the longitude to the full range and clamps latitude at the pole.

    -> (lat_min, lat_max, lon_min, lon_max) in degrees.  ``lon_min >
    lon_max`` signals a dateline-wrapping box (caller ORs the two ranges).
    """
    import math

    r = d_km / 6371.0087714  # angular distance, radians
    lat = math.radians(lat0)
    lat_min, lat_max = lat - r, lat + r
    half_pi = math.pi / 2
    if lat_min > -half_pi and lat_max < half_pi:
        lon_delta = math.asin(math.sin(r) / math.cos(lat))
        lon_min = math.radians(lon0) - lon_delta
        lon_max = math.radians(lon0) + lon_delta
        # wrap past the antimeridian: normalized min > max flags the split box
        two_pi = 2 * math.pi
        if lon_min < -math.pi:
            lon_min += two_pi
        if lon_max > math.pi:
            lon_max -= two_pi
    else:
        # box touches a pole: longitude unconstrained
        lat_min, lat_max = max(lat_min, -half_pi), min(lat_max, half_pi)
        lon_min, lon_max = -math.pi, math.pi
    return (
        math.degrees(lat_min),
        math.degrees(lat_max),
        math.degrees(lon_min),
        math.degrees(lon_max),
    )


def joindf_lookup(values_to_df: dict):
    """``joindf(field, dict_field)``: per-doc docfreq of the doc's field
    value as a term elsewhere (`JoinDocFreqValueSource.java`).  The bounded
    value->df map is broadcast once via ``ray.put``; the per-batch lookup is
    the vectorized ``index_in`` kernel."""
    import ray

    vals = pa.array(sorted(values_to_df), type=pa.string())
    dfs = pa.array([values_to_df[v] for v in sorted(values_to_df)], type=pa.int64())
    ref = ray.put((vals, dfs))

    def fn(t: pa.Table, *, value_col: str, out: str = "joindf") -> pa.Table:
        v, d = ray.get(ref)
        idx = pc.index_in(t[value_col].combine_chunks(), value_set=v)
        looked = pc.fill_null(pc.take(d, pc.fill_null(idx, 0)), 0)
        # values absent from the dictionary get df 0
        looked = pc.if_else(pc.is_null(idx), pa.scalar(0, type=pa.int64()), looked)
        return t.append_column(out, looked)

    return fn
