"""Recursive prefix-tree spatial indexing (quad tree) + convex-polygon filter.

The reference's grid-based spatial strategy
(`lucene/spatial/src/java/org/apache/lucene/spatial/prefix/RecursivePrefixTreeStrategy.java`
over `lucene/spatial/src/java/org/apache/lucene/spatial/prefix/tree/QuadPrefixTree.java`)
indexes each point as a chain of quad-tree cell tokens and answers an
``Intersects(shape)`` query by recursively covering the shape with grid
cells: cells FULLY inside the shape match every indexed point below them
with no further geometry work; boundary cells are subdivided down to
``max_level`` and their leaves verified point-by-point.

This module re-expresses that in columnar form.  A cell is ``(level,
code)`` where ``code`` packs 2 bits per level (lat half then lon half, most
significant first), so "point is inside cell c at level L" is one integer
compare of ``leaf_code >> 2*(max_level-L) == code`` — the numeric analog of
Lucene's term-prefix match, vectorizable with numpy over a whole batch.

Shapes are CONVEX polygons (vertex list, CCW).  Rectangle-vs-polygon
classification uses the separating-axis test, which is exact for convex
shapes; the point predicate is the all-edges-left half-plane test.  Both
run in float64 with a fixed evaluation order so a SQL oracle can replay the
point predicate bit-identically.
"""

from __future__ import annotations

import numpy as np

WORLD = (-90.0, 90.0, -180.0, 180.0)  # lat_min, lat_max, lon_min, lon_max

# cell relation constants (SpatialRelation.java analog)
DISJOINT, INTERSECTS, WITHIN = 0, 1, 2


def quad_codes(lat: np.ndarray, lon: np.ndarray, max_level: int) -> np.ndarray:
    """Leaf quad-tree code of each point at ``max_level`` (vectorized).

    Per level the cell splits at its midpoint: bit1 = lat in upper half,
    bit0 = lon in right half (`QuadPrefixTree.build` quadrant labeling).
    Points on a midpoint go to the upper/right cell (>=), matching the
    half-open [min, mid) / [mid, max) decomposition used by `_cell_bounds`.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    code = np.zeros(len(lat), dtype=np.uint64)
    lat_lo = np.full(len(lat), WORLD[0])
    lat_hi = np.full(len(lat), WORLD[1])
    lon_lo = np.full(len(lat), WORLD[2])
    lon_hi = np.full(len(lat), WORLD[3])
    for _ in range(max_level):
        lat_mid = (lat_lo + lat_hi) * 0.5
        lon_mid = (lon_lo + lon_hi) * 0.5
        up = lat >= lat_mid
        right = lon >= lon_mid
        code = (code << np.uint64(2)) | (
            (up.astype(np.uint64) << np.uint64(1)) | right.astype(np.uint64)
        )
        lat_lo = np.where(up, lat_mid, lat_lo)
        lat_hi = np.where(up, lat_hi, lat_mid)
        lon_lo = np.where(right, lon_mid, lon_lo)
        lon_hi = np.where(right, lon_hi, lon_mid)
    return code


def _cell_bounds(level: int, code: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of cell ``(level, code)``."""
    lat_lo, lat_hi, lon_lo, lon_hi = WORLD
    for i in range(level):
        shift = 2 * (level - 1 - i)
        q = (code >> shift) & 0b11
        lat_mid = (lat_lo + lat_hi) * 0.5
        lon_mid = (lon_lo + lon_hi) * 0.5
        lat_lo, lat_hi = (lat_mid, lat_hi) if q & 0b10 else (lat_lo, lat_mid)
        lon_lo, lon_hi = (lon_mid, lon_hi) if q & 0b01 else (lon_lo, lon_mid)
    return lat_lo, lat_hi, lon_lo, lon_hi


def point_in_convex(lat, lon, poly: list[tuple[float, float]]) -> np.ndarray:
    """All-edges-left test for a CCW convex polygon, vectorized.

    ``poly`` is [(lat, lon), ...] CCW in the (x=lon, y=lat) plane.  The
    cross product is evaluated as ``(x2-x1)*(y-y1) - (y2-y1)*(x-x1)`` —
    KEEP THIS ORDER: the SQL oracle replays the identical float64
    expression so the boundary decision is bit-identical (edge-inclusive,
    ``>= 0``).
    """
    y = np.asarray(lat, dtype=np.float64)
    x = np.asarray(lon, dtype=np.float64)
    inside = np.ones(len(y), dtype=bool)
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        inside &= (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) >= 0.0
    return inside


def min_edge_margin(lat, lon, poly: list[tuple[float, float]]) -> float:
    """Smallest |cross| over all points x edges — the float-safety margin
    asserted in tests (a point exactly on an edge line would make the
    >=0 decision order-sensitive across engines)."""
    y = np.asarray(lat, dtype=np.float64)
    x = np.asarray(lon, dtype=np.float64)
    m = np.inf
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        m = min(m, float(np.abs((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)).min()))
    return m


def _rect_vs_convex(bounds, poly: list[tuple[float, float]]) -> int:
    """Classify rectangle vs CCW convex polygon: WITHIN (rect fully inside),
    DISJOINT, or INTERSECTS.  Exact for convex shapes via the separating
    axis theorem (axes = rect edges + polygon edge normals)."""
    lat_lo, lat_hi, lon_lo, lon_hi = bounds
    corners_y = np.array([lat_lo, lat_lo, lat_hi, lat_hi])
    corners_x = np.array([lon_lo, lon_hi, lon_lo, lon_hi])
    # rect fully inside: all 4 corners pass every half-plane
    if bool(point_in_convex(corners_y, corners_x, poly).all()):
        return WITHIN
    py = np.array([p[0] for p in poly])
    px = np.array([p[1] for p in poly])
    # SAT axis 1/2: the rectangle's own axes
    if px.max() < lon_lo or px.min() > lon_hi or py.max() < lat_lo or py.min() > lat_hi:
        return DISJOINT
    # SAT remaining axes: each polygon edge normal — if all 4 rect corners
    # are strictly outside one half-plane, no overlap
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        if ((x2 - x1) * (corners_y - y1) - (y2 - y1) * (corners_x - x1) < 0.0).all():
            return DISJOINT
    return INTERSECTS


def cover_convex(
    poly: list[tuple[float, float]], max_level: int
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Recursive grid covering of a convex polygon
    (`RecursivePrefixTreeStrategy` Intersects recursion).

    Returns ``(within_cells, boundary_leaves)``: ``within_cells`` is a list
    of ``(level, code)`` cells FULLY inside the polygon (points below them
    match with no geometry test — Lucene's non-leaf covered-cell match);
    ``boundary_leaves`` is a sorted uint64 array of max_level cell codes
    that straddle the boundary (their points need the exact predicate —
    Lucene's leaf-cell verification)."""
    within: list[tuple[int, int]] = []
    boundary: list[int] = []

    def rec(level: int, code: int) -> None:
        rel = _rect_vs_convex(_cell_bounds(level, code), poly)
        if rel == DISJOINT:
            return
        if rel == WITHIN:
            within.append((level, code))
            return
        if level == max_level:
            boundary.append(code)
            return
        for q in range(4):
            rec(level + 1, (code << 2) | q)

    rec(0, 0)
    return within, np.sort(np.array(boundary, dtype=np.uint64))


def candidate_mask(
    leaf_codes: np.ndarray,
    within_cells: list[tuple[int, int]],
    boundary_leaves: np.ndarray,
    max_level: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(accepted, needs_verify) masks for points with ``max_level`` leaf
    codes, given a covering.  Prefix match is an integer shift+compare per
    covered cell (grouped per level so each level is one vectorized pass)."""
    leaf_codes = np.asarray(leaf_codes, dtype=np.uint64)
    accepted = np.zeros(len(leaf_codes), dtype=bool)
    by_level: dict[int, list[int]] = {}
    for level, code in within_cells:
        by_level.setdefault(level, []).append(code)
    for level, codes in by_level.items():
        shifted = leaf_codes >> np.uint64(2 * (max_level - level))
        accepted |= np.isin(shifted, np.array(codes, dtype=np.uint64))
    needs_verify = np.isin(leaf_codes, boundary_leaves) & ~accepted
    return accepted, needs_verify


# ---- general (non-convex / self-intersecting) polygons ----------------------
# Even-odd (crossing-number) semantics — `Shapes.java`'s default winding-free
# containment used by spatial4j for indexed polygons.  Parity only changes
# when a ray crosses an edge, so if NO polygon edge intersects a rectangle,
# containment is CONSTANT across the whole rectangle — the covering recursion
# stays exact for arbitrary polygons, including self-intersecting stars.


def point_in_polygon(lat, lon, poly: list[tuple[float, float]]) -> np.ndarray:
    """Even-odd crossing test, vectorized.  The crossing predicate is
    evaluated as ``lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1`` — KEEP
    THIS ORDER: the SQL oracle replays the identical float64 expression so
    the decision is bit-identical."""
    y = np.asarray(lat, dtype=np.float64)
    x = np.asarray(lon, dtype=np.float64)
    inside = np.zeros(len(y), dtype=bool)
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        cond = (y1 > y) != (y2 > y)
        if y2 != y1:
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            inside ^= cond & (x < xi)
    return inside


def _seg_intersects_rect(bounds, y1: float, x1: float, y2: float, x2: float) -> bool:
    """Closed-rect Liang-Barsky clip: True iff the segment touches the
    rectangle anywhere (touching counts — conservative: the cell is sent to
    exact verification, never wrongly accepted)."""
    lat_lo, lat_hi, lon_lo, lon_hi = bounds
    t0, t1 = 0.0, 1.0
    dx, dy = x2 - x1, y2 - y1
    for p, q in (
        (-dx, x1 - lon_lo),
        (dx, lon_hi - x1),
        (-dy, y1 - lat_lo),
        (dy, lat_hi - y1),
    ):
        if p == 0.0:
            if q < 0.0:
                return False
        else:
            r = q / p
            if p < 0.0:
                if r > t1:
                    return False
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return False
                if r < t1:
                    t1 = r
    return True


def _rect_vs_polygon(bounds, poly: list[tuple[float, float]]) -> int:
    """Classify rectangle vs arbitrary polygon under even-odd semantics.
    If any edge touches the rect -> INTERSECTS (verify); otherwise parity is
    constant over the rect and the center point decides WITHIN/DISJOINT."""
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        if _seg_intersects_rect(bounds, y1, x1, y2, x2):
            return INTERSECTS
    lat_lo, lat_hi, lon_lo, lon_hi = bounds
    cy = np.array([(lat_lo + lat_hi) * 0.5])
    cx = np.array([(lon_lo + lon_hi) * 0.5])
    return WITHIN if bool(point_in_polygon(cy, cx, poly)[0]) else DISJOINT


def cover_polygon(
    poly: list[tuple[float, float]], max_level: int
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """General-polygon covering — same contract as :func:`cover_convex`,
    using the edge-crossing rect classifier (exact for simple AND
    self-intersecting polygons under even-odd containment)."""
    within: list[tuple[int, int]] = []
    boundary: list[int] = []

    def rec(level: int, code: int) -> None:
        rel = _rect_vs_polygon(_cell_bounds(level, code), poly)
        if rel == DISJOINT:
            return
        if rel == WITHIN:
            within.append((level, code))
            return
        if level == max_level:
            boundary.append(code)
            return
        for q in range(4):
            rec(level + 1, (code << 2) | q)

    rec(0, 0)
    return within, np.sort(np.array(boundary, dtype=np.uint64))


def point_in_rings(lat, lon, rings: list[list[tuple[float, float]]]) -> np.ndarray:
    """Multi-ring even-odd containment (polygon with holes): total crossing
    parity over ALL rings' edges — XOR of per-ring parities, exactly the
    flat edge-sum the SQL oracle replays."""
    inside = np.zeros(len(np.asarray(lat)), dtype=bool)
    for ring in rings:
        inside ^= point_in_polygon(lat, lon, ring)
    return inside


def cover_rings(
    rings: list[list[tuple[float, float]]], max_level: int
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Covering for a multi-ring polygon: a cell no edge of ANY ring touches
    has constant total parity, so the classifier is the same edge-clip test
    over the flattened edge set + a center-point parity probe."""
    within: list[tuple[int, int]] = []
    boundary: list[int] = []

    def classify(bounds) -> int:
        for ring in rings:
            for (y1, x1), (y2, x2) in zip(ring, ring[1:] + ring[:1]):
                if _seg_intersects_rect(bounds, y1, x1, y2, x2):
                    return INTERSECTS
        lat_lo, lat_hi, lon_lo, lon_hi = bounds
        cy = np.array([(lat_lo + lat_hi) * 0.5])
        cx = np.array([(lon_lo + lon_hi) * 0.5])
        return WITHIN if bool(point_in_rings(cy, cx, rings)[0]) else DISJOINT

    def rec(level: int, code: int) -> None:
        rel = classify(_cell_bounds(level, code))
        if rel == DISJOINT:
            return
        if rel == WITHIN:
            within.append((level, code))
            return
        if level == max_level:
            boundary.append(code)
            return
        for q in range(4):
            rec(level + 1, (code << 2) | q)

    rec(0, 0)
    return within, np.sort(np.array(boundary, dtype=np.uint64))
