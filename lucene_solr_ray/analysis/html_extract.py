"""HTML -> (title, body text, meta tags) extraction.

Executable re-specification (NOT a code port) of the reference extractor
``lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds/DemoHTMLParser.java:62-163``
(SAX state machine over NekoHTML) in Python over ``html.parser``:

* characters are appended to ``body`` only while inside ``<body>`` and not
  inside a ``<style>``/``<script>`` (SUPPRESS_ELEMENTS, :160-163);
* the END of any element in ENDLINE_ELEMENTS (:153-158) appends ``'\\n'``;
* ``<img alt="x">`` inside body appends ``[x]`` (:86-93);
* ``title`` = trimmed character data inside ``<head><title>`` (:143);
* ``<meta name|http-equiv=... content=...>`` inside head captured with
  lowercased key (:72-81);
* ``<frameset>`` raises (parser "does not support HTML framesets", :98-99).

Deviation from NekoHTML (documented): we do not replicate tag-soup repair
(auto-closing of unclosed ``<li>``/``<p>`` etc.).  Void elements
(``br``/``hr``/``img``/...) are synthesized as start+end so ``<br>`` still
emits the newline NekoHTML's balance-tags feature produces.  Fixture HTML is
well-formed so both walks agree (see FIXTURES.md).
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["extract", "FramesetError", "ENDLINE_ELEMENTS", "SUPPRESS_ELEMENTS"]

# DemoHTMLParser.java:154-158
ENDLINE_ELEMENTS = frozenset(
    "p h1 h2 h3 h4 h5 h6 div ul ol dl pre hr blockquote address fieldset "
    "table form noscript li dt dd noframes br tr select option".split()
)
# DemoHTMLParser.java:161-163
SUPPRESS_ELEMENTS = frozenset(("style", "script"))

# HTML5 void elements: start tag implies an immediate end event (NekoHTML's
# balance-tags feature does the same), so </br>-less <br> still breaks lines.
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class FramesetError(ValueError):
    """Raised for <frameset> documents (rejected by the reference parser)."""


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.in_body = 0
        self.in_head = 0
        self.in_title = 0
        self.suppressed = 0
        self._title: list[str] = []
        self._body: list[str] = []
        self.meta: dict[str, str] = {}

    # -- SAX-equivalent events ------------------------------------------------
    def _start(self, tag: str, attrs: dict[str, str | None]) -> None:
        if self.in_head > 0:
            if tag == "title":
                self.in_title += 1
            elif tag == "meta":
                name = attrs.get("name")
                if name is None:
                    name = attrs.get("http-equiv")
                val = attrs.get("content")
                if name is not None and val is not None:
                    self.meta[name.lower()] = val
        elif self.in_body > 0:
            if tag in SUPPRESS_ELEMENTS:
                self.suppressed += 1
            elif tag == "img":
                alt = attrs.get("alt")
                if alt is not None:
                    self._body.append("[" + alt + "]")
        elif tag == "body":
            self.in_body += 1
        elif tag == "head":
            self.in_head += 1
        elif tag == "frameset":
            raise FramesetError("This parser does not support HTML framesets.")

    def _end(self, tag: str) -> None:
        if self.in_body > 0:
            if tag == "body":
                self.in_body -= 1
            elif tag in ENDLINE_ELEMENTS:
                self._body.append("\n")
            elif tag in SUPPRESS_ELEMENTS:
                self.suppressed -= 1
        elif self.in_head > 0:
            if tag == "head":
                self.in_head -= 1
            elif self.in_title > 0 and tag == "title":
                self.in_title -= 1

    # -- html.parser plumbing -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._start(tag, dict(attrs))
        if tag in _VOID_ELEMENTS:
            self._end(tag)

    def handle_startendtag(self, tag, attrs):
        self._start(tag, dict(attrs))
        self._end(tag)

    def handle_endtag(self, tag):
        if tag in _VOID_ELEMENTS:
            return  # synthesized at start already
        self._end(tag)

    def handle_data(self, data):
        if self.in_body > 0 and self.suppressed == 0:
            self._body.append(data)
        elif self.in_title > 0:
            self._title.append(data)


def extract(html: str | bytes) -> tuple[str, str, dict[str, str]]:
    """Parse *html*; return ``(title, body, meta_tags)``.

    ``body`` is the exact per-url invariant text ("byte-identical extracted
    text per url"); ``title`` is trimmed (DemoHTMLParser.java:143).
    Raises :class:`FramesetError` for frameset documents.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8")
    p = _Extractor()
    p.feed(html)
    p.close()
    return "".join(p._title).strip(), "".join(p._body), p.meta
