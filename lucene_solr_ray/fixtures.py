"""Deterministic synthetic web-page corpus (FIXTURES.md T1) + query set (T2).

Generates the Common-Crawl-style input table fixed by BASELINE.json's
input_hint: ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` plus ``doc_id`` (content-derived, stable under any partitioning)
and ``links_sim`` (long-tail multi-valued facet field, shaped after the
``links`` field histogram in
``lucene/core/src/test/org/apache/lucene/util/packed/LongTailPerformance.java:707-731``).

Generation is per-doc seeded (``Random(f"{seed}:{i}")``) so any row range can
be generated independently and in parallel (Ray Data over ``range(n)``), and
regeneration is byte-stable.  ``text`` is oracle-computed at generation time
via :func:`lucene_solr_ray.analysis.html_extract.extract` — the pipeline must
reproduce it byte-identically per url.

HTML constructs cover every rule of the DemoHTMLParser state machine
(`DemoHTMLParser.java:62-163`): head/title/meta, ENDLINE elements (p, h1-h6,
div, ul/li, table/tr, br, ...), script/style decoys, img-alt, entities,
nested divs.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from .analysis.html_extract import extract

SEED = 42
BASE_TS_US = 1_423_440_000_000_000  # 2015-02-09T00:00:00Z in epoch micros

_TLDS = ["example", "net", "org", "dk", "de", "fr", "io", "info"]
_LANGS = ["en"] * 40 + ["de", "fr", "es", "da"] * 2 + ["zh", "ja"]

_SYL = (
    "ba be bi bo bu ka ke ki ko ku la le li lo lu ma me mi mo mu na ne ni "
    "no nu ra re ri ro ru sa se si so su ta te ti to tu va ve vi vo vu za "
    "ze zi zo zu dor gar len mor tak vel wix yon zeph quil"
).split()

_CJK_POOL = "日本語文書検索引擎大規模分散処理高速索引構築解析器漢字中文网页搜索"
_HIRA_POOL = "あいうえおかきくけこさしすせそたちつてと"
_KATA_WORDS = ["データ", "システム", "インデックス", "クエリ", "トークン"]

_STOP_SPICE = "the of and to a in is it that for".split()


def _vocab(size: int = 50_000) -> list[str]:
    rnd = random.Random(SEED)
    out = []
    seen = set()
    while len(out) < size:
        w = "".join(rnd.choice(_SYL) for _ in range(rnd.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


_VOCAB: list[str] | None = None


def get_vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _vocab()
    return _VOCAB


def _zipf_word(rnd: random.Random, vocab: list[str]) -> str:
    # Zipf(alpha≈1.1) via inverse-power sampling, clipped to the vocab
    u = rnd.random()
    rank = int((u ** (-1 / 0.1) - 1) % len(vocab))  # heavy head, long tail
    return vocab[rank]


def _words(rnd: random.Random, vocab: list[str], n: int, lang: str) -> str:
    out = []
    for _ in range(n):
        r = rnd.random()
        if lang in ("zh", "ja") and r < 0.5:
            if lang == "ja" and r < 0.15:
                out.append(rnd.choice(_KATA_WORDS))
            elif lang == "ja" and r < 0.25:
                out.append("".join(rnd.choice(_HIRA_POOL) for _ in range(rnd.randint(1, 3))))
            else:
                out.append("".join(rnd.choice(_CJK_POOL) for _ in range(rnd.randint(1, 4))))
        elif r < 0.18:
            out.append(rnd.choice(_STOP_SPICE))
        elif r < 0.21:
            out.append(str(rnd.randint(0, 9999)))
        else:
            out.append(_zipf_word(rnd, vocab))
    return " ".join(out)


def _links_count(rnd: random.Random) -> int:
    # long-tail: most docs few links, a few docs many (LongTailPerformance shape)
    r = rnd.random()
    if r < 0.5:
        return rnd.randint(0, 2)
    if r < 0.9:
        return rnd.randint(2, 8)
    return rnd.randint(8, 30)


def make_page(doc_id: int, seed: int = SEED) -> dict:
    """Generate one page row (pure function of (doc_id, seed))."""
    rnd = random.Random(f"{seed}:{doc_id}")
    vocab = get_vocab()
    lang = _LANGS[rnd.randrange(len(_LANGS))]
    site = doc_id % 97
    tld = _TLDS[site % len(_TLDS)]
    host = f"site{site:04d}.{tld}"
    path = rnd.choice(["news", "blog", "docs", "wiki", "shop"])
    url = f"https://{host}/{path}/{doc_id:06d}.html"

    title = _words(rnd, vocab, rnd.randint(2, 6), "en")
    nblocks = rnd.randint(2, 8)
    body_parts: list[str] = []
    for _ in range(nblocks):
        kind = rnd.random()
        content = _words(rnd, vocab, rnd.randint(8, 60), lang)
        if kind < 0.45:
            body_parts.append(f"<p>{content}</p>")
        elif kind < 0.55:
            body_parts.append(f"<h{rnd.randint(1,3)}>{content}</h{rnd.randint(1,3)}>")
        elif kind < 0.65:
            items = "".join(f"<li>{_words(rnd, vocab, rnd.randint(2,6), lang)}</li>" for _ in range(rnd.randint(2, 4)))
            body_parts.append(f"<ul>{items}</ul>")
        elif kind < 0.72:
            rows = "".join(
                f"<tr><td>{_words(rnd, vocab, 2, lang)}</td><td>{rnd.randint(0,999)}</td></tr>"
                for _ in range(rnd.randint(1, 3))
            )
            body_parts.append(f"<table>{rows}</table>")
        elif kind < 0.80:
            body_parts.append(f"<div>outer {content}<div>inner &amp; nested &#233;</div></div>")
        elif kind < 0.86:
            body_parts.append(f"<script>var x = {rnd.randint(0,100)}; // decoy</script>")
        elif kind < 0.90:
            body_parts.append("<style>.c{color:red}</style>")
        elif kind < 0.95:
            body_parts.append(f'<img alt="{_words(rnd, vocab, 2, "en")}">')
        else:
            body_parts.append(f"line one<br>line two {content}")
    meta = f'<meta name="keywords" content="{_words(rnd, vocab, 3, "en")}"><meta http-equiv="Content-Type" content="text/html">'
    html = (
        f"<html><head><title> {title} </title>{meta}</head>\n"
        f"<body>{''.join(body_parts)}</body></html>"
    )
    _, text, _ = extract(html)

    n_links = _links_count(rnd)
    # link ids: Zipf over a large id space -> long-tail ordinal histogram
    links = sorted({f"lnk{int((rnd.random() ** (-1/0.25) - 1) % 200_000):06d}" for _ in range(n_links)})

    return {
        "doc_id": doc_id,
        "url": url,
        "warc_ts": BASE_TS_US + doc_id * 37_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
        "host": host,
        "tld": tld,
        "links_sim": links,
    }


_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("host", pa.string()),
        ("tld", pa.string()),
        ("links_sim", pa.list_(pa.string())),
    ]
)


def make_pages_batch(doc_ids: np.ndarray, seed: int = SEED, dup_rate: float = 0.005) -> pa.Table:
    """Vector of rows for the given doc_ids (plus dedup-exercising dups).

    Every 200th doc (doc_id % 200 == 199) is a DUPLICATE of doc_id-1's url
    with a later warc_ts and extended html — exercises keep-most-recent dedup
    (`RetainMostRecentUpdateConflictResolver` analog).  Duplicate rows keep
    their own doc_id; dedup drops the EARLIER row by (url, warc_ts).
    """
    rows = []
    for i in np.asarray(doc_ids).tolist():
        if i % 200 == 199:
            base = make_page(i - 1, seed)
            html = base["html"].decode("utf-8").replace(
                "</body>", "<p>updated edition</p></body>"
            )
            _, text, _ = extract(html)
            rows.append(
                {
                    **base,
                    "doc_id": i,
                    "warc_ts": base["warc_ts"] + 1_000_000_000,
                    "html": html.encode("utf-8"),
                    "text": text,
                }
            )
        else:
            rows.append(make_page(i, seed))
    cols = {name: [r[name] for r in rows] for name in _SCHEMA.names}
    arrays = [pa.array(cols[f.name], type=f.type) for f in _SCHEMA]
    return pa.Table.from_arrays(arrays, schema=_SCHEMA)


def write_pages_parquet(out_dir: str, n: int, n_files: int = 8, seed: int = SEED) -> list[str]:
    """Driver-side parallel generation via Ray tasks; returns file paths.

    Files are the unit of input partitioning for the index build.  Uses plain
    Ray tasks (generation is embarrassingly parallel and range-keyed; a
    Dataset source adds nothing here).
    """
    import os

    import pyarrow.parquet as pq
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen_file(fi: int, lo: int, hi: int) -> str:
        path = os.path.join(out_dir, f"pages-{fi:05d}.parquet")
        tbl = make_pages_batch(np.arange(lo, hi), seed)
        pq.write_table(tbl, path)
        return path

    per = (n + n_files - 1) // n_files
    futs = [
        gen_file.remote(fi, fi * per, min(n, (fi + 1) * per))
        for fi in range(n_files)
        if fi * per < n
    ]
    return sorted(ray.get(futs))


def make_query_set(n: int = 200, seed: int = SEED) -> list[dict]:
    """T2 reference query set: mix of single-term / AND / OR / +must -not /
    phrase / field-scoped, with per-query k and facet fields."""
    rnd = random.Random(f"{seed}:queries")
    vocab = get_vocab()
    out = []
    for qid in range(n):
        r = rnd.random()
        if r < 0.4:
            q = {"type": "term", "terms": [_zipf_word(rnd, vocab)]}
        elif r < 0.7:
            q = {"type": "and", "terms": [_zipf_word(rnd, vocab) for _ in range(2)]}
        elif r < 0.85:
            q = {"type": "or", "terms": [_zipf_word(rnd, vocab) for _ in range(rnd.randint(2, 3))]}
        elif r < 0.90:
            q = {"type": "must_not", "terms": [_zipf_word(rnd, vocab), _zipf_word(rnd, vocab)]}
        elif r < 0.95:
            q = {"type": "phrase", "terms": [_zipf_word(rnd, vocab), _zipf_word(rnd, vocab)]}
        else:
            site = rnd.randrange(97)
            q = {"type": "field", "field": "host", "terms": [f"site{site:04d}.{_TLDS[site % len(_TLDS)]}"]}
        q["qid"] = qid
        q["k"] = 100 if rnd.random() < 0.1 else 10
        q["facet_fields"] = rnd.sample(["host", "tld", "lang"], k=rnd.randint(0, 2))
        out.append(q)
    return out


def query_to_ast(q: dict):
    from .query.ast import BoolQ, FilterQ, PhraseQ, TermQ

    t = q["terms"]
    if q["type"] == "term":
        return TermQ(t[0])
    if q["type"] == "and":
        return BoolQ(must=tuple(TermQ(x) for x in t))
    if q["type"] == "or":
        return BoolQ(should=tuple(TermQ(x) for x in t))
    if q["type"] == "must_not":
        return BoolQ(must=(TermQ(t[0]),), must_not=(TermQ(t[1]),))
    if q["type"] == "phrase":
        return PhraseQ(tuple(t))
    if q["type"] == "field":
        return FilterQ(q["field"], t[0])
    raise ValueError(q["type"])
