"""Recursive prefix-tree polygon filter (RecursivePrefixTreeStrategy /
QuadPrefixTree analog, `functions/spatial_rpt.py`).

Gates: covering invariants on random convex polygons (accepted-without-
verify points are ALWAYS true hits; resolved set == exact predicate),
cell-bounds/leaf-code consistency, rect-vs-polygon classification, the
fixture polygon's float-safety margin over the real synthetic points, and
the pipeline e2e vs a brute-force predicate pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.functions.spatial_rpt import (
    DISJOINT,
    INTERSECTS,
    WITHIN,
    _cell_bounds,
    _rect_vs_convex,
    candidate_mask,
    cover_convex,
    min_edge_margin,
    point_in_convex,
    quad_codes,
)
from lucene_solr_ray.pipelines.relational import RPT_LEVEL, RPT_POLY

SF = "/root/testdata/sf0.001"


def _random_convex(rng, n=6):
    """Random CCW convex polygon: points on an ellipse at sorted angles."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    cy, cx = rng.uniform(-40, 40), rng.uniform(-90, 90)
    ry, rx = rng.uniform(10, 45), rng.uniform(10, 80)
    return [(cy + ry * np.sin(a), cx + rx * np.cos(a)) for a in angles]


def _synth_coords(keys):
    lat = ((keys * 7) % 1800) / 10.0 - 90.0
    lon = ((keys * 13) % 3600) / 10.0 - 180.0
    return lat, lon


class TestCellMath:
    def test_leaf_cell_contains_point(self):
        rng = np.random.default_rng(7)
        lat = rng.uniform(-90, 90, 500)
        lon = rng.uniform(-180, 180, 500)
        codes = quad_codes(lat, lon, 6)
        for i in range(0, 500, 37):
            lo, hi, wlo, whi = _cell_bounds(6, int(codes[i]))
            assert lo <= lat[i] < hi or (hi == 90.0 and lat[i] == 90.0)
            assert wlo <= lon[i] < whi or (whi == 180.0 and lon[i] == 180.0)

    def test_prefix_is_parent_cell(self):
        # shifting a leaf code right by 2 gives the enclosing level-1 cell
        rng = np.random.default_rng(3)
        lat = rng.uniform(-90, 90, 200)
        lon = rng.uniform(-180, 180, 200)
        c5 = quad_codes(lat, lon, 5)
        c4 = quad_codes(lat, lon, 4)
        assert (c5 >> np.uint64(2) == c4).all()

    def test_rect_vs_convex_cases(self):
        tri = [(0.0, 0.0), (0.0, 40.0), (30.0, 0.0)]  # CCW right triangle
        assert _rect_vs_convex((5.0, 10.0, 5.0, 10.0), tri) == WITHIN
        assert _rect_vs_convex((50.0, 60.0, 50.0, 60.0), tri) == DISJOINT
        assert _rect_vs_convex((-10.0, 10.0, -10.0, 10.0), tri) == INTERSECTS
        # diagonal-separated: bbox overlaps but the hypotenuse separates
        assert _rect_vs_convex((25.0, 29.0, 35.0, 39.0), tri) == DISJOINT


class TestCovering:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_covering_resolves_to_exact(self, seed):
        rng = np.random.default_rng(seed)
        poly = _random_convex(rng)
        level = 6
        within, boundary = cover_convex(poly, level)
        lat = rng.uniform(-90, 90, 4000)
        lon = rng.uniform(-180, 180, 4000)
        codes = quad_codes(lat, lon, level)
        accepted, needs_verify = candidate_mask(codes, within, boundary, level)
        exact = point_in_convex(lat, lon, poly)
        # WITHIN-cell acceptance never admits a false positive
        assert exact[accepted].all()
        # accepted + verified boundary points == the exact predicate
        resolved = accepted | (needs_verify & exact)
        np.testing.assert_array_equal(resolved, exact)

    def test_deeper_level_accepts_more_without_verify(self):
        rng = np.random.default_rng(11)
        poly = _random_convex(rng)
        lat = rng.uniform(-90, 90, 4000)
        lon = rng.uniform(-180, 180, 4000)
        fracs = []
        for level in (4, 7):
            within, boundary = cover_convex(poly, level)
            codes = quad_codes(lat, lon, level)
            accepted, _ = candidate_mask(codes, within, boundary, level)
            exact = point_in_convex(lat, lon, poly)
            fracs.append(accepted.sum() / max(1, exact.sum()))
        assert fracs[1] > fracs[0]  # finer grid -> more prefix-only accepts


class TestFixturePolygon:
    def test_ccw_and_margin(self):
        ys = [p[0] for p in RPT_POLY]
        xs = [p[1] for p in RPT_POLY]
        area = sum(
            xs[i] * ys[(i + 1) % len(xs)] - xs[(i + 1) % len(xs)] * ys[i]
            for i in range(len(xs))
        )
        assert area > 0  # CCW
        # float-safety margin over the REAL synthetic grid points at the
        # largest test scale: no point sits near any edge line, so the >=0
        # decision cannot flip between numpy and DuckDB
        keys = pq.read_table(
            "/root/testdata/sf0.1/customer.parquet", columns=["c_custkey"]
        )["c_custkey"].to_numpy()
        lat, lon = _synth_coords(keys)
        assert min_edge_margin(lat, lon, RPT_POLY) > 0.5

    def test_pipeline_matches_brute_force(self, ray_session):
        from lucene_solr_ray.pipelines.relational import polygon_customers

        got = polygon_customers(SF)["c_custkey"].to_pylist()
        keys = pq.read_table(SF + "/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        lat, lon = _synth_coords(keys)
        want = sorted(keys[point_in_convex(lat, lon, RPT_POLY)].tolist())
        assert got == want
        assert len(got) > 0

    def test_prefix_accept_covers_most_hits(self):
        # the RPT point: most hits never touch the geometry predicate
        keys = pq.read_table(
            "/root/testdata/sf0.01/customer.parquet", columns=["c_custkey"]
        )["c_custkey"].to_numpy()
        lat, lon = _synth_coords(keys)
        within, boundary = cover_convex(RPT_POLY, RPT_LEVEL)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, _ = candidate_mask(codes, within, boundary, RPT_LEVEL)
        exact = point_in_convex(lat, lon, RPT_POLY)
        assert accepted.sum() >= 0.9 * exact.sum()


class TestNonConvexStar:
    """General-polygon covering (even-odd semantics) over the concave star."""

    def test_covering_exact_vs_brute_predicate(self):
        from lucene_solr_ray.functions.spatial_rpt import (
            candidate_mask,
            cover_polygon,
            point_in_polygon,
            quad_codes,
        )
        from lucene_solr_ray.pipelines.relational import STAR_POLY

        # dense deterministic grid straddling the star (incl. concavities)
        lat = np.repeat(np.arange(-60.0, 60.0, 0.83), 145)
        lon = np.tile(np.arange(-60.0, 60.0, 0.83), len(lat) // 145)
        within, boundary = cover_polygon(STAR_POLY, RPT_LEVEL)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, verify = candidate_mask(codes, within, boundary, RPT_LEVEL)
        got = accepted.copy()
        idx = np.flatnonzero(verify)
        got[idx] = point_in_polygon(lat[idx], lon[idx], STAR_POLY)
        want = point_in_polygon(lat, lon, STAR_POLY)
        assert (got == want).all()
        assert want.sum() > 100
        # concavity probe: the gap between two star points is OUTSIDE
        assert not point_in_polygon(np.array([30.0]), np.array([20.0]), STAR_POLY)[0]
        # ...but the star center is inside
        assert point_in_polygon(np.array([5.0]), np.array([-10.0]), STAR_POLY)[0]

    def test_within_cells_accept_most_hits(self):
        from lucene_solr_ray.functions.spatial_rpt import (
            candidate_mask,
            cover_polygon,
            point_in_polygon,
            quad_codes,
        )
        from lucene_solr_ray.pipelines.relational import STAR_POLY

        keys = pq.read_table(SF + "/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        lat, lon = _synth_coords(keys)
        within, boundary = cover_polygon(STAR_POLY, RPT_LEVEL)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, _ = candidate_mask(codes, within, boundary, RPT_LEVEL)
        exact = point_in_polygon(lat, lon, STAR_POLY)
        assert accepted.sum() >= 0.7 * exact.sum()

    def test_pipeline_matches_brute_force(self, ray_session):
        from lucene_solr_ray.functions.spatial_rpt import point_in_rings
        from lucene_solr_ray.pipelines.relational import (
            STAR_RINGS,
            polygon_star_customers,
        )

        got = polygon_star_customers(SF)["c_custkey"].to_pylist()
        keys = pq.read_table(SF + "/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        lat, lon = _synth_coords(keys)
        want = sorted(keys[point_in_rings(lat, lon, STAR_RINGS)].tolist())
        assert got == want
        assert len(got) > 0

    def test_hole_ring_parity(self):
        """Multi-ring even-odd: covering == brute parity on a dense grid,
        and the hole's interior is OUT while the star body around it is IN."""
        from lucene_solr_ray.functions.spatial_rpt import (
            candidate_mask,
            cover_rings,
            point_in_rings,
            quad_codes,
        )
        from lucene_solr_ray.pipelines.relational import STAR_RINGS

        lat = np.repeat(np.arange(-60.0, 60.0, 0.83), 145)
        lon = np.tile(np.arange(-60.0, 60.0, 0.83), len(lat) // 145)
        within, boundary = cover_rings(STAR_RINGS, RPT_LEVEL)
        codes = quad_codes(lat, lon, RPT_LEVEL)
        accepted, verify = candidate_mask(codes, within, boundary, RPT_LEVEL)
        got = accepted.copy()
        idx = np.flatnonzero(verify)
        got[idx] = point_in_rings(lat[idx], lon[idx], STAR_RINGS)
        want = point_in_rings(lat, lon, STAR_RINGS)
        assert (got == want).all()
        # hole center (the star center) is OUT under multi-ring parity...
        assert not point_in_rings(np.array([5.05]), np.array([-10.06]), STAR_RINGS)[0]
        # ...while a body point outside the hole is IN
        assert point_in_rings(np.array([15.0]), np.array([-10.0]), STAR_RINGS)[0]

    def test_no_data_point_near_crossing_boundary(self):
        """Parity safety over the real grid at the largest test scale: for
        every edge, every data point's lon is far from the crossing x — the
        `lon < xi` decision cannot flip between numpy and DuckDB float64."""
        from lucene_solr_ray.pipelines.relational import STAR_POLY

        keys = pq.read_table(
            "/root/testdata/sf0.1/customer.parquet", columns=["c_custkey"]
        )["c_custkey"].to_numpy()
        y, x = _synth_coords(keys)
        from lucene_solr_ray.pipelines.relational import STAR_RINGS

        edges = [
            e
            for ring in STAR_RINGS
            for e in zip(ring, ring[1:] + ring[:1])
        ]
        for (y1, x1), (y2, x2) in edges:
            if y1 == y2:
                continue
            cond = (y1 > y) != (y2 > y)
            xi = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            gaps = np.abs(x[cond] - xi[cond])
            assert gaps.min() > 1e-6
            # and no data latitude equals a vertex latitude (flip line)
            assert (y != y1).all()


class TestHeatmap:
    """facet.heatmap analog: integer-space cell counts, zero-filled grid."""

    def test_matches_duckdb_oracle(self, ray_session):
        import duckdb

        import __ray_entry__
        from lucene_solr_ray.pipelines.relational import heatmap_customers

        got = heatmap_customers(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
        )
        want = con.execute(__ray_entry__.oracle_sql()["heatmap_customers"]).fetchdf()
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want) == 11 * 11
        for c in got.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_dense_grid_and_totals(self, ray_session):
        from lucene_solr_ray.pipelines.relational import (
            HEATMAP_COL_RANGE,
            HEATMAP_LEVEL,
            HEATMAP_ROW_RANGE,
            heatmap_customers,
        )

        t = heatmap_customers(SF).to_pandas()
        # dense row-major grid: every region cell exactly once
        assert len(t) == 11 * 11
        assert t["heat_row"].min() == HEATMAP_ROW_RANGE[0]
        assert t["heat_row"].max() == HEATMAP_ROW_RANGE[1]
        # zero-count cells are emitted (counts_ints2D dense contract)
        assert (t["cell_count"] == 0).any()
        # total equals an independent brute count of region membership
        keys = pq.read_table(SF + "/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        row = (((keys * 7) % 1800) << HEATMAP_LEVEL) // 1800
        col = (((keys * 13) % 3600) << HEATMAP_LEVEL) // 3600
        m = (
            (row >= HEATMAP_ROW_RANGE[0])
            & (row <= HEATMAP_ROW_RANGE[1])
            & (col >= HEATMAP_COL_RANGE[0])
            & (col <= HEATMAP_COL_RANGE[1])
        )
        assert t["cell_count"].sum() == int(m.sum()) > 0


class TestHeatmapOverPolygon:
    """facet.heatmap composed with the RPT polygon fq: counted docs are the
    star-with-hole accept set, region is the star's bbox-snapped cells."""

    def test_region_constants_match_sql(self):
        """The oracle SQL hardcodes rows 10..24 x cols 11..18; they must be
        exactly heatmap_region_for_rings(STAR_RINGS, HEATMAP_LEVEL)."""
        from lucene_solr_ray.pipelines.relational import (
            HEATMAP_LEVEL,
            STAR_RINGS,
            heatmap_region_for_rings,
        )

        assert heatmap_region_for_rings(STAR_RINGS, HEATMAP_LEVEL) == (
            (10, 24),
            (11, 18),
        )

    def test_matches_duckdb_oracle(self, ray_session):
        import duckdb

        import __ray_entry__
        from lucene_solr_ray.pipelines.relational import heatmap_polygon_customers

        got = heatmap_polygon_customers(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
        )
        want = con.execute(
            __ray_entry__.oracle_sql()["heatmap_polygon_customers"]
        ).fetchdf()
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want) == 15 * 8
        for c in got.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_counts_are_polygon_filtered(self, ray_session):
        """Totals == |star accept set restricted to the region|, strictly
        below the unfiltered heatmap total over the same cells — i.e. the
        fq really filters; and zero cells exist (dense contract)."""
        from lucene_solr_ray.functions.spatial_rpt import point_in_rings
        from lucene_solr_ray.pipelines.relational import (
            HEATMAP_LEVEL,
            STAR_RINGS,
            heatmap_polygon_customers,
        )

        t = heatmap_polygon_customers(SF).to_pandas()
        keys = pq.read_table(SF + "/customer.parquet", columns=["c_custkey"])[
            "c_custkey"
        ].to_numpy()
        lat = ((keys * 7) % 1800) / 10.0 - 90.0
        lon = ((keys * 13) % 3600) / 10.0 - 180.0
        inside = point_in_rings(lat, lon, STAR_RINGS)
        row = (((keys * 7) % 1800) << HEATMAP_LEVEL) // 1800
        col = (((keys * 13) % 3600) << HEATMAP_LEVEL) // 3600
        region = (row >= 10) & (row <= 24) & (col >= 11) & (col <= 18)
        assert t["cell_count"].sum() == int((inside & region).sum()) > 0
        assert t["cell_count"].sum() < int(region.sum())
        assert (t["cell_count"] == 0).any()
