"""Byte-identity differential gate for the hand-rolled HTML extract scanner
(`analysis/html_extract._extract_fast`) vs the html.parser reference path
(`extract_slow`) — the round-4 build-throughput lever must never change the
"byte-identical extracted text per url" invariant.

The public `extract()` falls back to the slow path (`_Bail`) on markup
outside the fast subset, so the contract under test is: for EVERY input,
`extract(html) == extract_slow(html)` — either the fast result is identical
or the fallback fired.
"""

from __future__ import annotations

import pytest

from lucene_solr_ray.analysis.html_extract import (
    FramesetError,
    _Bail,
    _extract_fast,
    _extract_tmpl,
    extract,
    extract_slow,
)

ADVERSARIAL = [
    # charrefs in title, body, and attribute values
    '<html><head><title> A &amp; B &lt;C&gt; </title></head><body>x &amp; y</body></html>',
    '<html><head><meta name="k" content="a &amp; b"></head><body><img alt="x &gt; y">t</body></html>',
    # comments, declarations, processing instructions
    '<!DOCTYPE html><html><head><!-- <title>no</title> --><title>t</title></head><body>a<!-- c -->b</body></html>',
    '<html><head><?pi junk?><title>t</title></head><body>d</body></html>',
    # script/style cdata: fake tags inside are data, not events
    '<html><body>a<script>if (x<y) { "</div>" }</script>b</body></html>',
    '<html><body>a<style>p > span { color: red }</style>b</body></html>',
    '<html><head><style>h1 { x: "</span>" }</style><title>t</title></head><body>z</body></html>',
    '<html><body>a<SCRIPT>x</SCRIPT>b</body></html>',
    '<html><body>a<script>unterminated',
    # void + self-closing elements
    '<html><body>a<br>b<hr/>c<img alt="pic">d</body></html>',
    '<html><body>a<br/>b</br>c</body></html>',
    # endline elements emit newline at END only
    '<html><body><p>one</p><div>two</div><ul><li>x</li></ul></body></html>',
    # uppercase tags/attrs, attribute quoting variants
    '<HTML><HEAD><TITLE>T</TITLE></HEAD><BODY><IMG ALT=plain>u</BODY></HTML>',
    "<html><body><img alt='sq'>v</body></html>",
    '<html><head><meta http-equiv="Refresh" content="5"></head><body>w</body></html>',
    # attr value containing '>' inside quotes
    '<html><body><img alt="a > b">t</body></html>',
    # nested/duplicate structure, stray end tags
    '<html><body><div><div>deep</div></div>tail</body></html>',
    '<html><body>a</script>b</body></html>',  # stray close suppresses (parity)
    '<html><body>a</p?>b</body></html>',  # malformed end tag -> fallback
    '<html><body>a <3 b</body></html>',  # bare '<' -> fallback
    '<html><body>a<b',  # unterminated tag -> fallback
    # img with no alt, meta without content
    '<html><head><meta name="only"></head><body><img src="x">y</body></html>',
    # title outside head is ignored; body-less html
    '<html><body>t1<title>not title</title>t2</body></html>',
    '<html><head><title>only head</title></head></html>',
    # whitespace/newlines inside tags
    '<html>\n<head>\n<title>\nmulti\nline\n</title>\n</head>\n<body>\na\n<p\nclass="x">b</p>\n</body>\n</html>',
    # empty and trivial docs
    '', 'plain text no tags', '<p>no html/body</p>',
]


def _norm(h):
    try:
        return ("ok", extract_slow(h))
    except FramesetError:
        return ("frameset", None)


class TestFastExtractDifferential:
    @pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
    def test_adversarial_byte_identity(self, idx):
        h = ADVERSARIAL[idx]
        want = _norm(h)
        try:
            got = ("ok", extract(h))
        except FramesetError:
            got = ("frameset", None)
        assert got == want, h

    def test_fixture_corpus_byte_identity(self):
        from lucene_solr_ray.fixtures import make_page

        n_fast = 0
        for i in range(500):
            h = make_page(i)["html"].decode()
            assert extract(h) == extract_slow(h)
            try:
                _extract_fast(h)
                n_fast += 1
            except _Bail:
                pass
        # the fixture corpus must ride the fast path, not the fallback
        assert n_fast == 500

    def test_frameset_raises_on_fast_path(self):
        with pytest.raises(FramesetError):
            extract('<html><frameset rows="1"></frameset></html>')

    def test_tmpl_adversarial_equal_or_bail(self):
        # tier-0 template scanner: for every adversarial input, either
        # _Bail (a deeper tier handles it) or byte-identical to html.parser
        for h in ADVERSARIAL:
            try:
                got = _extract_tmpl(h)
            except _Bail:
                continue
            except FramesetError:
                with pytest.raises(FramesetError):
                    extract_slow(h)
                continue
            assert got == extract_slow(h), h

    def test_tmpl_fixture_corpus_coverage(self):
        # the fixture corpus must ride the TIER-0 path (script/style/img
        # included), not fall through to the event loop
        from lucene_solr_ray.fixtures import make_page

        for i in range(300):
            h = make_page(i)["html"].decode()
            assert _extract_tmpl(h) == extract_slow(h)

    def test_tmpl_fuzz_differential(self):
        # seeded random soups over the constructs the template subset
        # claims to handle plus everything just outside it: equal-or-bail
        import random

        rnd = random.Random(20260819)
        frags = [
            "t {i} &amp; x", "a &lt; b", "plain", " s p a c e ", "",
            "<p>", "</p>", "<P>", "</P>", "<ul>", "</ul>", "<li>", "</li>",
            "<td>", "</td>", "<div>", "</div>", "<br>", "<br/>", "</br>",
            "<hr>", "<hr/>", "<p/>", "<span>", "</span>", "<tr>", "</tr>",
            '<img alt="pic {i}">', "<img>", '<img src="u">',
            '<img alt="a &gt; b">', "<IMG ALT=up>",
            "<script>var x = {i}; // <p>fake</p></script>",
            "<script>if (a<b) x;</script>", "<style>.c{{color:red}}</style>",
            "<SCRIPT>u</SCRIPT>", "<script>unterminated",
            "</script>", "</style>", "<script/>",
            "<!-- comment <p>no</p> -->", "<!decl>", "<?pi?>",
            "a <3 b", "<p", "</p >", "</p class=x>", "<p class='y'>",
            '<p a="v>w">', "<title>body title</title>", "<meta name='k'>",
            "<frameset>", "</frameset>", "<body>", "</head>", "<head>",
            "x</body>y", "</BODY>", "</body >",
        ]
        heads = [
            "<title> T {i} </title>", "<title>A</title><title>B</title>",
            '<meta name="k" content="v {i}">', "<meta http-equiv='r' content='5'>",
            "<meta name='only'>", "<meta content='orphan'>", "",
            "<title>t<br>u</title>", "<style>h1{{x:1}}</style><title>s</title>",
            "<link rel='x' href='y'>", "<title>a &amp; b</title>",
        ]
        n_checked = 0
        for i in range(2500):
            nh = rnd.randint(0, 2)
            nb = rnd.randint(0, 6)
            head = "".join(rnd.choice(heads).format(i=i) for _ in range(nh))
            bod = "".join(rnd.choice(frags).format(i=i) for _ in range(nb))
            shape = rnd.random()
            if shape < 0.7:
                h = f"<html><head>{head}</head>\n<body>{bod}</body></html>"
            elif shape < 0.8:
                h = f"  <html> <head>{head}</head><body>{bod}</body> </html> "
            elif shape < 0.9:
                h = f"<html><head>{head}</head><body>{bod}</body></html>trail"
            else:
                h = f"<html>{bod}</html>"
            try:
                want = ("ok", extract_slow(h))
            except FramesetError:
                want = ("frameset", None)
            # full public path: must equal slow everywhere
            try:
                got = ("ok", extract(h))
            except FramesetError:
                got = ("frameset", None)
            assert got == want, h
            # tier-0 directly: equal-or-bail
            try:
                got_t = ("ok", _extract_tmpl(h))
            except _Bail:
                continue
            except FramesetError:
                got_t = ("frameset", None)
            n_checked += 1
            assert got_t == want, h
        assert n_checked > 500  # the tier-0 path must actually engage

    def test_stray_suppress_close_matches_slow(self):
        # stray </script> drives html.parser's counter negative and mutes
        # body data; a later <script> open flips it back — fast path must
        # bail rather than diverge
        h = '<html><body>a</script>b<script>c</script>d</body></html>'
        assert extract(h) == extract_slow(h)
