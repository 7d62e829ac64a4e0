"""Response writers: serialize result tables to Solr wire formats.

Re-specification of the response-writer family
(`solr/core/src/java/org/apache/solr/response/JSONResponseWriter.java`,
`XMLWriter.java`, `CSVResponseWriter.java`): an Arrow table of result docs
becomes the standard ``wt=json`` / ``wt=xml`` / ``wt=csv`` payload shapes.
Typed XML elements follow the reference's type tags (str/int/long/float/
double/bool/date); CSV quotes per RFC 4180 like ``CSVResponseWriter``.
"""

from __future__ import annotations

import io
import json
from xml.sax.saxutils import escape

import pyarrow as pa


def _attr(v) -> str:
    """Escape for the name="..." attribute position (incl. double quotes;
    sax escape() alone leaves '"' unescaped and would emit malformed XML
    for corpus-derived values)."""
    return escape(str(v), {'"': '&quot;'})


def _rows(table: pa.Table) -> list[dict]:
    return table.to_pylist()


def _xml_tag(value) -> str:
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, int):
        return "long"
    if isinstance(value, float):
        return "double"
    import datetime

    if isinstance(value, (datetime.date, datetime.datetime)):
        return "date"
    return "str"


def to_json_response(table: pa.Table, *, num_found: int | None = None,
                     start: int = 0, qtime_ms: int = 0, indent: bool = False,
                     facets: dict | None = None) -> str:
    """``wt=json``: responseHeader + response{numFound, start, docs}
    (+ facet_counts in the SAME payload, like the reference)."""
    docs = _rows(table)
    payload = {
        "responseHeader": {"status": 0, "QTime": int(qtime_ms)},
        "response": {
            "numFound": len(docs) if num_found is None else int(num_found),
            "start": int(start),
            "docs": docs,
        },
    }
    if facets:
        payload["facet_counts"] = {"facet_fields": facets}
    return json.dumps(payload, indent=2 if indent else None, default=str)


def to_xml_response(table: pa.Table, *, num_found: int | None = None,
                    start: int = 0, qtime_ms: int = 0,
                    facets: dict | None = None) -> str:
    """``wt=xml``: the classic ``<response><result ...><doc>`` shape
    (+ ``<lst name="facet_counts">`` in the same document)."""
    docs = _rows(table)
    nf = len(docs) if num_found is None else int(num_found)
    out = io.StringIO()
    out.write('<?xml version="1.0" encoding="UTF-8"?>\n<response>\n')
    out.write('<lst name="responseHeader">')
    out.write(f'<int name="status">0</int><int name="QTime">{int(qtime_ms)}</int>')
    out.write("</lst>\n")
    out.write(f'<result name="response" numFound="{nf}" start="{int(start)}">\n')
    for d in docs:
        out.write("<doc>")
        for k, v in d.items():
            if v is None:
                continue
            if isinstance(v, list):
                out.write(f'<arr name="{_attr(k)}">')
                for item in v:
                    tag = _xml_tag(item)
                    out.write(f"<{tag}>{escape(str(item))}</{tag}>")
                out.write("</arr>")
            else:
                tag = _xml_tag(v)
                out.write(f'<{tag} name="{_attr(k)}">{escape(str(v))}</{tag}>')
        out.write("</doc>\n")
    out.write("</result>\n")
    if facets:
        out.write('<lst name="facet_counts"><lst name="facet_fields">')
        for f, items in facets.items():
            out.write(f'<lst name="{_attr(f)}">')
            for v, c in items:
                name = "" if v is None else _attr(v)
                out.write(f'<int name="{name}">{int(c)}</int>')
            out.write("</lst>")
        out.write("</lst></lst>\n")
    out.write("</response>\n")
    return out.getvalue()


def to_csv_response(table: pa.Table, *, separator: str = ",",
                    mv_separator: str = "|") -> str:
    """``wt=csv``: header row + one line per doc; multi-valued fields joined
    with ``mv_separator`` (CSVResponseWriter's ``f.<field>.csv.separator``)."""
    import csv

    out = io.StringIO()
    w = csv.writer(out, delimiter=separator, lineterminator="\n")
    cols = table.column_names
    w.writerow(cols)
    for d in _rows(table):
        row = []
        for c in cols:
            v = d.get(c)
            if isinstance(v, list):
                row.append(mv_separator.join(str(x) for x in v))
            else:
                row.append("" if v is None else v)
        w.writerow(row)
    return out.getvalue()
