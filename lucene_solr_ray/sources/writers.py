"""Response writers: serialize result tables to Solr wire formats.

Re-specification of the response-writer family
(`solr/core/src/java/org/apache/solr/response/JSONResponseWriter.java`,
`XMLWriter.java`, `CSVResponseWriter.java`): an Arrow table of result docs
becomes the standard ``wt=json`` / ``wt=xml`` / ``wt=csv`` payload shapes.
Typed XML elements follow the reference's type tags (str/int/long/float/
double/bool/date); CSV quotes per RFC 4180 like ``CSVResponseWriter``.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
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


def _py_payload(table: pa.Table, num_found, start, qtime_ms) -> dict:
    docs = _rows(table)
    return {
        "responseHeader": {"status": 0, "QTime": int(qtime_ms)},
        "response": {
            "numFound": len(docs) if num_found is None else int(num_found),
            "start": int(start),
            "docs": docs,
        },
    }


def to_python_response(table: pa.Table, *, num_found: int | None = None,
                       start: int = 0, qtime_ms: int = 0) -> str:
    """``wt=python`` (`solr/core/src/java/org/apache/solr/response/
    PythonResponseWriter.java:30-95`): the JSON payload rendered as a
    Python literal — single-quoted strings, ``True``/``False``/``None`` —
    so ``ast.literal_eval`` round-trips it.  Python's ``repr`` of the
    nested dict/list/scalar payload IS that rendering (dates stringified
    first, like the JSON writer's ``default=str``)."""
    def conv(v):

        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, (datetime.date, datetime.datetime)):
            return str(v)
        return v

    return repr(conv(_py_payload(table, num_found, start, qtime_ms)))


def to_ruby_response(table: pa.Table, *, num_found: int | None = None,
                     start: int = 0, qtime_ms: int = 0) -> str:
    """``wt=ruby`` (`RubyResponseWriter.java:28-60`): hash-rocket pairs,
    ``nil`` for null, single-quoted strings with ``\\`` and ``'``
    escaped — eval-able Ruby, per the reference's NaN/Infinity-free
    contract."""
    def render(v) -> str:

        if v is None:
            return "nil"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, dict):
            inner = ",".join(f"{render(k)}=>{render(x)}" for k, x in v.items())
            return "{" + inner + "}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(render(x) for x in v) + "]"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, (datetime.date, datetime.datetime)):
            v = str(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    return render(_py_payload(table, num_found, start, qtime_ms))


# ---- javabin (binary wire format) -------------------------------------------
#
# Minimal JavaBinCodec v2 subset (`solr/solrj/src/java/org/apache/solr/
# common/util/JavaBinCodec.java:60-120`, format publicly documented on the
# Solr wiki): NULL / BOOL / LONG (small-vint) / DOUBLE / STR / ARR /
# ORDERED_MAP — enough to carry the response payload.  Round-trip tested
# against its own reader; cross-implementation parity with SolrJ is
# untestable in this sandbox (no JVM) and documented as such.

_JB_NULL, _JB_TRUE, _JB_FALSE, _JB_DOUBLE, _JB_LONG = 0, 1, 2, 5, 7
_JB_STR, _JB_ARR, _JB_OMAP = 1 << 5, 4 << 5, 5 << 5


def _jb_vint(out: bytearray, v: int) -> None:
    while (v & ~0x7F) != 0:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _jb_tagged_size(out: bytearray, tag: int, size: int) -> None:
    """Upper-3-bit tag with the size packed in the low 5 bits (0x1F means
    'continued as vint')."""
    if size < 0x1F:
        out.append(tag | size)
    else:
        out.append(tag | 0x1F)
        _jb_vint(out, size - 0x1F)


def javabin_dumps(obj) -> bytes:
    out = bytearray([2])  # version byte

    def write(v):

        if v is None:
            out.append(_JB_NULL)
        elif isinstance(v, bool):
            out.append(_JB_TRUE if v else _JB_FALSE)
        elif isinstance(v, int):
            out.append(_JB_LONG)
            out.extend(int(v).to_bytes(8, "big", signed=True))
        elif isinstance(v, float):

            out.append(_JB_DOUBLE)
            out.extend(struct.pack(">d", v))
        elif isinstance(v, (datetime.date, datetime.datetime)):
            write(str(v))
        elif isinstance(v, str):
            b = v.encode("utf-8")
            _jb_tagged_size(out, _JB_STR, len(b))
            out.extend(b)
        elif isinstance(v, dict):
            _jb_tagged_size(out, _JB_OMAP, len(v))
            for k, x in v.items():
                write(str(k))
                write(x)
        elif isinstance(v, (list, tuple)):
            _jb_tagged_size(out, _JB_ARR, len(v))
            for x in v:
                write(x)
        else:
            write(str(v))

    write(obj)
    return bytes(out)


def javabin_loads(data: bytes):
    pos = [1]  # skip version byte
    if not data or data[0] != 2:
        raise ValueError("unsupported javabin version")

    def rd_vint() -> int:
        v, shift = 0, 0
        while True:
            b = data[pos[0]]
            pos[0] += 1
            v |= (b & 0x7F) << shift
            if not (b & 0x80):
                return v
            shift += 7

    def rd_size(tagbyte: int) -> int:
        size = tagbyte & 0x1F
        if size == 0x1F:
            size += rd_vint()
        return size

    def read():

        tb = data[pos[0]]
        pos[0] += 1
        tag = tb & 0xE0
        if tag:
            size = rd_size(tb)
            if tag == _JB_STR:
                s = data[pos[0]:pos[0] + size].decode("utf-8")
                pos[0] += size
                return s
            if tag == _JB_ARR:
                return [read() for _ in range(size)]
            if tag == _JB_OMAP:
                return {read(): read() for _ in range(size)}
            raise ValueError(f"unsupported javabin tag 0x{tag:02x}")
        if tb == _JB_NULL:
            return None
        if tb == _JB_TRUE:
            return True
        if tb == _JB_FALSE:
            return False
        if tb == _JB_LONG:
            v = int.from_bytes(data[pos[0]:pos[0] + 8], "big", signed=True)
            pos[0] += 8
            return v
        if tb == _JB_DOUBLE:
            v = struct.unpack(">d", data[pos[0]:pos[0] + 8])[0]
            pos[0] += 8
            return v
        raise ValueError(f"unsupported javabin tag byte 0x{tb:02x}")

    return read()


def to_javabin_response(table: pa.Table, *, num_found: int | None = None,
                        start: int = 0, qtime_ms: int = 0) -> bytes:
    """``wt=javabin``: the response payload through :func:`javabin_dumps`."""
    return javabin_dumps(_py_payload(table, num_found, start, qtime_ms))
