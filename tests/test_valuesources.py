"""Value sources: strdist DP, ms floor semantics, geodist haversine (no Ray)."""

import numpy as np
import pyarrow as pa

from lucene_solr_ray.functions.valuesources import geodist_km, levenshtein_to, ms_between


def test_levenshtein_matches_reference():
    col = pa.array(["kitten", "sitting", "", "saturday", "sunday", "abc"])
    d = levenshtein_to(col, "kitten")
    assert d.tolist() == [0, 3, 6, 7, 6, 6]
    d2 = levenshtein_to(pa.array(["sunday"]), "saturday")
    assert d2.tolist() == [3]


def test_ms_floor_semantics():
    ts = pa.array(
        [np.datetime64("2024-01-15T00:00:00.000500"), np.datetime64("2024-01-14T23:59:59.999500")],
        type=pa.timestamp("us"),
    )
    out = ms_between(ts, "2024-01-15T00:00:00Z").to_pylist()
    # floor toward -inf: +500us -> 0ms; -500us -> -1ms
    assert out == [0, -1]


def test_ms_unit_independent():
    """ms/s/us physical units must give identical results."""
    import datetime

    inst = [datetime.datetime(2024, 1, 16), datetime.datetime(2024, 1, 14, 12)]
    want = ms_between(pa.array(inst, type=pa.timestamp("us")), "2024-01-15T00:00:00Z").to_pylist()
    for unit in ("ms", "s", "ns"):
        got = ms_between(pa.array(inst, type=pa.timestamp(unit)), "2024-01-15T00:00:00Z").to_pylist()
        assert got == want, unit


def test_ms_ns_submicrosecond_truncates():
    """ns values that aren't whole microseconds must truncate, not raise."""
    base = 1_705_276_800_000_000_000  # 2024-01-15T00:00:00Z in ns
    arr = pa.array([base + 1, base + 999_999_999], type=pa.timestamp("ns"))
    out = ms_between(arr, "2024-01-15T00:00:00Z").to_pylist()
    assert out == [0, 999]


def test_geodist_known_points():
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
    d = geodist_km(pa.array([51.5074]), pa.array([-0.1278]), 48.8566, 2.3522)
    assert abs(d[0].as_py() - 343.5) < 1.5
    # zero distance
    d0 = geodist_km(pa.array([10.0]), pa.array([20.0]), 10.0, 20.0)
    assert d0[0].as_py() == 0.0
