"""Response writers (JSON/XML/CSV round-trips) + english analyzer chain."""

from __future__ import annotations

import csv
import io
import json
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from lucene_solr_ray.sources.writers import to_csv_response, to_json_response, to_xml_response

TBL = pa.table(
    {
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "title": pa.array(['say "hi" <b>', "plain"]),
        "score": pa.array([1.5, 0.25], type=pa.float64()),
        "tags": pa.array([["a", "b"], []]),
    }
)


class TestWriters:
    def test_json_shape(self):
        p = json.loads(to_json_response(TBL, num_found=10, start=2, qtime_ms=7))
        assert p["responseHeader"] == {"status": 0, "QTime": 7}
        assert p["response"]["numFound"] == 10 and p["response"]["start"] == 2
        assert p["response"]["docs"][0]["doc_id"] == 1
        assert p["response"]["docs"][0]["tags"] == ["a", "b"]

    def test_xml_parses_and_types(self):
        x = to_xml_response(TBL)
        root = ET.fromstring(x)
        result = root.find("result")
        assert result.get("numFound") == "2"
        doc = result.findall("doc")[0]
        by_name = {e.get("name"): e for e in doc}
        assert by_name["doc_id"].tag == "long" and by_name["doc_id"].text == "1"
        assert by_name["score"].tag == "double"
        assert by_name["title"].text == 'say "hi" <b>'  # escaped then unescaped
        assert [e.text for e in by_name["tags"]] == ["a", "b"]

    def test_xml_attribute_quote_escaping(self):
        # corpus-derived facet values / field names with '"' must stay
        # well-formed in the name="..." attribute position
        t = pa.table({'fi"eld': pa.array(["v"])})
        x = to_xml_response(t, facets={"f": [('va"l', 3), (None, 1)]})
        root = ET.fromstring(x)  # raises on malformed XML
        doc = root.find("result").findall("doc")[0]
        assert doc[0].get("name") == 'fi"eld'
        ff = root.find('lst[@name="facet_counts"]/lst[@name="facet_fields"]/lst[@name="f"]')
        assert ff[0].get("name") == 'va"l' and ff[0].text == "3"

    def test_csv_round_trip(self):
        c = to_csv_response(TBL)
        rows = list(csv.reader(io.StringIO(c)))
        assert rows[0] == ["doc_id", "title", "score", "tags"]
        assert rows[1][0] == "1" and rows[1][1] == 'say "hi" <b>'
        assert rows[1][3] == "a|b" and rows[2][3] == ""


class TestEnglishAnalyzer:
    def test_query_analyzer_chain(self):
        from lucene_solr_ray.stages.tokenize import query_analyzer

        en = query_analyzer("english")
        assert [t for t, _ in en("Running cafés")] == ["run", "cafe"]
        # stopwords removed before stemming, positions keep gaps
        assert [(t, p) for t, p in en("the runner is running")] == [("runner", 1), ("run", 3)]

    def test_lang_aware_routing(self, ray_session, tmp_path):
        """analyzer='by_lang': en docs stem, others keep the standard chain."""
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "lang": pa.array(["en", "de"]),
                "text": pa.array(["running water", "running wasser"]),
            }
        )
        src = str(tmp_path / "d.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="by_lang", facet_fields=("lang",),
                    resume=False)
        loc = LocalIndex(ix)
        # en doc indexed the stem; de doc the surface form
        assert loc.postings("text", "run")[0].tolist() == [0]
        assert loc.postings("text", "running")[0].tolist() == [1]

    def test_index_build_with_english_analyzer(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex
        from lucene_solr_ray.query.ast import Evaluator
        from lucene_solr_ray.query.parser import QueryParser

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    ["running fast", "he runs daily", "unrelated words here"]
                ),
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="english", facet_fields=(), resume=False)
        loc = LocalIndex(ix)
        # "running" and "runs" both stem to "run": df(run) == 2
        docs, tfs = loc.postings("text", "run")
        assert docs.tolist() == [0, 1]
        # parser with the same analyzer finds them from the surface form
        ast = QueryParser(analyzer="english").parse("Running")
        got, _ = Evaluator(loc).scored(ast)
        assert got.tolist() == [0, 1]


class TestScriptWriters:
    """wt=python / wt=ruby / wt=javabin (round 5: response-writer family
    complete; javabin round-trips through its own codec — SolrJ parity
    untestable without a JVM, documented in the module)."""

    def _table(self):
        return pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "title": pa.array(["it's a test", None]),
                "score": pa.array([1.5, 2.0], type=pa.float64()),
                "tags": pa.array([["a", "b"], []]),
            }
        )

    def test_python_literal_eval_round_trip(self):
        import ast as pyast

        from lucene_solr_ray.sources.writers import to_python_response

        s = to_python_response(self._table(), qtime_ms=3)
        payload = pyast.literal_eval(s)
        assert payload["responseHeader"] == {"status": 0, "QTime": 3}
        assert payload["response"]["numFound"] == 2
        assert payload["response"]["docs"][0]["title"] == "it's a test"
        assert payload["response"]["docs"][1]["title"] is None
        assert payload["response"]["docs"][0]["tags"] == ["a", "b"]

    def test_ruby_shape(self):
        from lucene_solr_ray.sources.writers import to_ruby_response

        s = to_ruby_response(self._table())
        assert s.startswith("{'responseHeader'=>{'status'=>0")
        assert "'title'=>'it\\'s a test'" in s
        assert "'title'=>nil" in s
        assert "'tags'=>['a','b']" in s

    def test_javabin_round_trip(self):
        from lucene_solr_ray.sources.writers import (
            javabin_loads,
            to_javabin_response,
        )

        b = to_javabin_response(self._table(), qtime_ms=7)
        assert isinstance(b, bytes) and b[0] == 2
        payload = javabin_loads(b)
        assert payload["responseHeader"]["QTime"] == 7
        docs = payload["response"]["docs"]
        assert docs[0] == {"id": 1, "title": "it's a test", "score": 1.5,
                           "tags": ["a", "b"]}
        assert docs[1]["title"] is None and docs[1]["tags"] == []

    def test_javabin_long_string_and_big_sizes(self):
        from lucene_solr_ray.sources.writers import javabin_dumps, javabin_loads

        obj = {"s": "x" * 4000, "arr": list(range(100)),
               "neg": -12345678901234, "f": -0.25, "b": True, "n": None}
        assert javabin_loads(javabin_dumps(obj)) == obj
