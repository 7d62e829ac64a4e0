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
