"""Field-mutating update processors: pure-Arrow unit tests (no Ray)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

from lucene_solr_ray.stages import processors as up


@pytest.fixture
def tbl():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "title": pa.array(["  hello  ", "world", "  x "]),
            "body": pa.array(["a-b-c", "", None]),
            "nums": pa.array([[3.0, 1.0, 2.0], [], [5.0]]),
            "snum": pa.array(["41", "42", "43"]),
            "sdate": pa.array(["2024-01-02T03:04:05"] * 3),
        }
    )


def test_trim(tbl):
    out = up.trim_fields(tbl, fields=("title",))
    assert out["title"].to_pylist() == ["hello", "world", "x"]


def test_regex_replace(tbl):
    out = up.regex_replace(tbl, field="body", pattern="-", replacement="_")
    assert out["body"].to_pylist() == ["a_b_c", "", None]


def test_truncate(tbl):
    out = up.truncate_field(tbl, field="title", max_length=4)
    assert out["title"].to_pylist() == ["  he", "worl", "  x "]


def test_concat(tbl):
    out = up.concat_fields(tbl, fields=("title", "body"), out="joined", sep="|")
    assert out["joined"].to_pylist()[0] == "  hello  |a-b-c"
    assert out["joined"].to_pylist()[2] == "  x |"  # null -> ""


def test_field_length(tbl):
    out = up.field_length(tbl, field="body", out="blen")
    assert out["blen"].to_pylist() == [5, 0, None]


def test_parse_numeric_and_date(tbl):
    out = up.parse_numeric(tbl, field="snum", kind="long")
    assert out["snum"].to_pylist() == [41, 42, 43]
    out = up.parse_date(tbl, field="sdate")
    assert out["sdate"][0].as_py() == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_clone_first_count(tbl):
    out = up.clone_field(tbl, src="title", dest="title_copy")
    assert out["title_copy"].to_pylist() == tbl["title"].to_pylist()
    out = up.count_field_values(tbl, field="nums", out="n")
    assert out["n"].to_pylist() == [3, 0, 1]
    out = up.first_field_value(tbl, field="nums", out="first")
    assert out["first"].to_pylist()[0] == 3.0


def test_min_max_field_value(tbl):
    out = up.max_field_value(tbl, field="nums", out="mx")
    mx = out["mx"].to_pylist()
    assert mx[0] == 3.0 and mx[2] == 5.0 and mx[1] != mx[1]  # NaN for empty
    out = up.min_field_value(tbl, field="nums", out="mn")
    assert out["mn"].to_pylist()[0] == 1.0


def test_remove_blank_default(tbl):
    out = up.remove_blank(tbl, fields=("body",))
    assert out["body"].to_pylist() == ["a-b-c", None, None]
    out = up.default_value(out, field="body", value="?")
    assert out["body"].to_pylist() == ["a-b-c", "?", "?"]


def test_content_uuid_deterministic(tbl):
    a = up.content_uuid(tbl, fields=("title", "body"))["id"].to_pylist()
    b = up.content_uuid(tbl, fields=("title", "body"))["id"].to_pylist()
    assert a == b and len(set(a)) == 3
    assert all(len(x) == 36 and x.count("-") == 4 for x in a)


def test_chain_composes(tbl):
    out = up.trim_fields(tbl, fields=("title",))
    out = up.field_length(out, field="title", out="tlen")
    out = up.regex_replace(out, field="title", pattern="l+", replacement="L")
    assert out["title"].to_pylist() == ["heLo", "worLd", "x"]
    assert out["tlen"].to_pylist() == [5, 5, 1]
