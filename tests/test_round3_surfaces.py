"""Differential gates for the round-3 surfaces: TermVectorsComponent,
RealTimeGet, and the geofilt spatial radius filter — engine vs the same
DuckDB SQL the driver runs (sf0.001 for speed; the driver re-checks at
sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="testdata not present",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    return c


def _both(ray_session, con, name):
    import __ray_entry__

    eng = __ray_entry__.queries()[name](SF)
    if hasattr(eng, "to_pandas"):
        eng = eng.to_pandas()
    ora = con.execute(__ray_entry__.oracle_sql()[name]).fetchdf()
    eng = eng[sorted(eng.columns)].reset_index(drop=True)
    ora = ora[sorted(ora.columns)].reset_index(drop=True)
    return eng, ora


def test_term_vectors_match_oracle(ray_session, con):
    eng, ora = _both(ray_session, con, "term_vectors_docs")
    assert list(eng.columns) == list(ora.columns)
    assert len(eng) == len(ora) > 0
    for c in eng.columns:
        assert (eng[c].astype(str) == ora[c].astype(str)).all(), c
    # a doc's tf over its vector equals its token count
    tok = con.execute(
        """SELECT count(*) FROM (
             SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
             FROM documents WHERE doc_id = 0) WHERE t <> ''"""
    ).fetchone()[0]
    assert int(eng[eng.doc_id == 0]["tf"].sum()) == tok


def test_realtime_get_matches_oracle(ray_session, con):
    eng, ora = _both(ray_session, con, "realtime_get_docs")
    assert len(eng) == len(ora) > 0
    for c in eng.columns:
        assert (eng[c].astype(str) == ora[c].astype(str)).all(), c


def test_bbox_matches_oracle_and_is_circle_superset(ray_session, con):
    eng, ora = _both(ray_session, con, "bbox_customers")
    assert len(eng) == len(ora) > 0
    assert (eng["c_custkey"] == ora["c_custkey"]).all()
    # the box fully contains its inscribed circle: every key the same-radius
    # geofilt at the same point keeps must also be in the bbox result
    import numpy as np

    from lucene_solr_ray.functions.valuesources import calc_bbox_deg, geodist_km
    from lucene_solr_ray.pipelines.relational import BBOX_PT, GEO_RADIUS_KM

    keys = con.execute("SELECT c_custkey FROM customer").fetchdf()["c_custkey"].to_numpy()
    lat = ((keys * 7) % 1800) / 10.0 - 90.0
    lon = ((keys * 13) % 3600) / 10.0 - 180.0
    d = np.asarray(geodist_km(lat, lon, *BBOX_PT))
    circle = set(keys[d < GEO_RADIUS_KM].tolist())
    assert circle and circle <= set(eng["c_custkey"].tolist())
    # and the box is a STRICT superset at this fixture scale (corner keys)
    assert len(eng) > len(circle)
    # box bounds are sane: the lon half-width exceeds the lat half-width
    # (asin(sin r / cos lat) > r away from the equator)
    lat_min, lat_max, lon_min, lon_max = calc_bbox_deg(*BBOX_PT, GEO_RADIUS_KM)
    assert (lon_max - lon_min) > (lat_max - lat_min)


def test_bbox_pole_crossing_opens_longitude():
    from lucene_solr_ray.functions.valuesources import calc_bbox_deg

    lat_min, lat_max, lon_min, lon_max = calc_bbox_deg(85.0, 10.0, 2000.0)
    assert lat_max == 90.0 and (lon_min, lon_max) == (-180.0, 180.0)
    # south pole, too
    lat_min2, _, lon_min2, lon_max2 = calc_bbox_deg(-85.0, 10.0, 2000.0)
    assert lat_min2 == -90.0 and (lon_min2, lon_max2) == (-180.0, 180.0)


def test_geofilt_matches_oracle_with_margin(ray_session, con):
    eng, ora = _both(ray_session, con, "geofilt_customers")
    assert len(eng) == len(ora) > 0
    assert (eng["c_custkey"] == ora["c_custkey"]).all()
    # no synthetic point sits near the radius boundary: engine/oracle libm
    # 1-ulp trig differences can never flip the filter predicate
    margin = con.execute(
        """WITH pts AS (
             SELECT ((c_custkey * 7) % 1800) / 10.0 - 90.0 AS lat,
                    ((c_custkey * 13) % 3600) / 10.0 - 180.0 AS lon
             FROM customer)
           SELECT min(abs(2 * 6371.0087714 * asin(sqrt(
                    pow(sin(radians(lat)/2),2)
                    + cos(radians(0.0))*cos(radians(lat))*pow(sin(radians(lon)/2),2)))
                  - 2000.0))
           FROM pts"""
    ).fetchone()[0]
    assert margin > 0.01
