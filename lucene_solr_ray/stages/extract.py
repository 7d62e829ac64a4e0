"""HTML→text extraction stage (map_batches over Arrow batches).

Ray Data expression of the reference ingest extractors
(`solr/contrib/extraction/.../ExtractingDocumentLoader.java`,
`DemoHTMLParser.java:62-163` — see analysis.html_extract for the exact state
machine).  Frameset documents are rejected by the reference parser; here they
yield ``text=None`` + ``extract_ok=False`` so the pipeline can drop or audit
them without killing the task.
"""

from __future__ import annotations

import pyarrow as pa

from ..analysis.html_extract import FramesetError, extract


def extract_batch(batch: pa.Table) -> pa.Table:
    """Adds ``text`` (extracted body), ``title`` and ``extract_ok`` columns.

    Input needs an ``html`` binary/string column.  Pure function — safe for
    stateless Ray tasks; the HTML parser is constructed per doc (cheap, no
    warmup state worth an actor pool).
    """
    htmls = batch.column("html").to_pylist()
    texts: list[str | None] = []
    titles: list[str | None] = []
    ok: list[bool] = []
    for h in htmls:
        try:
            title, body, _meta = extract(h)
            texts.append(body)
            titles.append(title)
            ok.append(True)
        except (FramesetError, UnicodeDecodeError):
            texts.append(None)
            titles.append(None)
            ok.append(False)
    cols = {name: batch.column(name) for name in batch.column_names if name not in ("text", "title", "extract_ok")}
    out = pa.table({**cols,
                    "text": pa.array(texts, type=pa.string()),
                    "title": pa.array(titles, type=pa.string()),
                    "extract_ok": pa.array(ok, type=pa.bool_())})
    return out
