"""HTML → text extraction for web-corpus ingestion.

Training pipelines consume crawls whose payloads are HTML; the first
transform is always extract-the-text (drop markup, scripts, styles;
keep block structure; unescape entities; count/collect links).  The
reference indexes pre-extracted text (dogsheep_beta/utils.py feeds
SQLite rows), so this is an engine extension, not a port.

Spark shape: the parser is stdlib ``html.parser.HTMLParser`` (no
external deps) driven through Arrow-batched ``mapInPandas`` — Python
touches data in columnar batches only, the same contract as the media
codecs in operators/multimodal.py.  Everything downstream (quality
rules, dedup, tokenization) consumes the extracted ``text`` column.

r13 (guide §4.5): the parser classes are defined at MODULE level —
they were previously defined inside the per-row helpers, so every row
paid a full class construction (type object + method table) before
parsing a byte; now a row costs one instantiation.  Rows without a
``<`` skip the parser entirely (plain-text crawl payloads are common;
the fast path is exact because markupless text has no tags to strip,
no entities only ``&`` could introduce, and whitespace collapsing is
reproduced directly).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame

# tags whose text content is dropped entirely
_SKIP_TAGS = {"script", "style", "noscript", "template"}
# tags that delimit text blocks (flush the buffer on open AND close)
_BLOCK_TAGS = {
    "p", "div", "li", "br", "title", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "section", "article", "header", "footer",
    "blockquote", "pre",
}


class _TextParser(HTMLParser):
    """Block-structured text + title + link count (see _parse_one)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self.buf: list[str] = []
        self.skip = 0
        self.in_title = False
        self.title = ""
        self.n_links = 0

    def _flush(self):
        text = " ".join("".join(self.buf).split())
        if text:
            self.blocks.append(text)
        self.buf = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip += 1
            return
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag == "title":
                self.in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip = max(0, self.skip - 1)
            return
        if tag in _BLOCK_TAGS:
            if tag == "title" and self.buf:
                self.title = " ".join("".join(self.buf).split())
            self._flush()
            self.in_title = False

    def handle_data(self, data):
        if not self.skip:
            self.buf.append(data)


def _parse_one(html: str) -> tuple[str, str, int]:
    """(text, title, n_links): block-structured text — one line per
    non-empty block, internal whitespace collapsed to single spaces —
    plus the <title> content and the count of <a href=...> anchors.
    Entities are unescaped (convert_charrefs), script/style content is
    dropped, malformed markup is tolerated (stdlib parser recovers).

    Markupless fast path (r13): no ``<`` means no tags and no
    entity-introducing ``&...;`` is treated specially by HTMLParser
    only when it parses as a charref — but ``convert_charrefs``
    unescaping applies to ``&amp;``-style refs whether or not a tag
    exists, so the fast path still routes through ``unescape`` and is
    byte-identical to the parser on such input."""
    h = html or ""
    if "<" not in h:
        if "&" in h:
            from html import unescape

            h = unescape(h)
        text = " ".join(h.split())
        return (text, "", 0) if text else ("", "", 0)
    p = _TextParser()
    p.feed(h)
    p.close()
    p._flush()
    return "\n".join(p.blocks), p.title, p.n_links


def html_to_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, text, title, n_links) — extracted text per document.

    ``text`` is one line per non-empty block element (whitespace
    collapsed), entities unescaped, script/style dropped; ``title`` is
    the <title> content ('' if absent); ``n_links`` counts anchors
    with an href.  Map-only: one Arrow batch in, one out, no shuffle —
    at 100 TB this is a scan whose cost is the parse itself."""
    import pandas as pd

    id_dt = df.schema[id_col].dataType.simpleString()

    def extract(batches):
        for pdf in batches:
            out = {"id": [], "text": [], "title": [], "n_links": []}
            for i, h in zip(pdf[id_col], pdf[html_col]):
                text, title, n_links = _parse_one(
                    h if isinstance(h, str) else ""
                )
                out["id"].append(i)
                out["text"].append(text)
                out["title"].append(title)
                out["n_links"].append(n_links)
            yield pd.DataFrame(out)

    return df.select(id_col, html_col).mapInPandas(
        extract, schema=f"id {id_dt}, text string, title string, n_links int"
    )


#: defensive cap on collected anchor text — an anchor left unclosed
#: to end-of-document must not emit megabytes of page body as "text"
_MAX_ANCHOR_CHARS = 4096


class _LinkParser(HTMLParser):
    """(href, anchor text) collector with HTML5 auto-close semantics
    (see _parse_links)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list = []  # [href, [text parts], n_chars]
        self.open: int | None = None  # index into links

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self.open = None  # HTML5: <a> auto-closes an open <a>
            href = dict(attrs).get("href")
            if href is not None:
                self.open = len(self.links)
                self.links.append([href, [], 0])

    def handle_endtag(self, tag):
        if tag == "a":
            self.open = None

    def handle_data(self, data):
        if self.open is None:
            return
        link = self.links[self.open]
        room = _MAX_ANCHOR_CHARS - link[2]
        if room > 0:
            link[1].append(data[:room])
            link[2] += min(len(data), room)


def _parse_links(html: str) -> list:
    """(href, anchor_text) per <a href=...>.

    HTML5 semantics: anchors cannot nest — a new ``<a>`` start tag
    auto-closes any open anchor (what browsers' tree builder does),
    so a page full of unclosed ``<a href>`` tags (rampant in crawl
    data) yields one bounded anchor per link instead of one anchor
    accumulating the rest of the document.  Anchor text is further
    capped at ``_MAX_ANCHOR_CHARS`` as a last-resort bound (an
    unclosed FINAL anchor still stops collecting there).  Anchors
    without href are skipped; script content never parses as markup
    (HTMLParser treats it as CDATA)."""
    h = html or ""
    if "<" not in h:
        return []  # no tags → no anchors
    p = _LinkParser()
    p.feed(h)
    p.close()
    return [
        (href, " ".join("".join(parts).split()))
        for href, parts, _ in p.links
    ]


def extract_links(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, href, anchor) — one row per anchor with an href, in
    document order (HTML5 auto-close semantics, see _parse_links).
    The edge list under every link-graph signal (PageRank priors,
    anchor-text retrieval, spam neighborhoods).  Map-only Arrow
    batches, the html_to_text contract; compose with
    functions/urls.py:canonicalize_url for graph-key hygiene."""
    import pandas as pd

    id_dt = df.schema[id_col].dataType.simpleString()

    def extract(batches):
        for pdf in batches:
            out = {"id": [], "href": [], "anchor": []}
            for i, h in zip(pdf[id_col], pdf[html_col]):
                for href, anchor in _parse_links(
                    h if isinstance(h, str) else ""
                ):
                    out["id"].append(i)
                    out["href"].append(href)
                    out["anchor"].append(anchor)
            yield pd.DataFrame(out)

    return df.select(id_col, html_col).mapInPandas(
        extract, schema=f"id {id_dt}, href string, anchor string"
    )
