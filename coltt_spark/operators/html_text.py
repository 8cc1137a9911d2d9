"""HTML → text extraction for web-corpus ingestion.

The step between WARC ingestion and every text operator in the
repo: real training corpora arrive as crawled HTML (Common Crawl
ships WARC files of ``text/html`` records), and the first pipeline
stage is boilerplate-aware text extraction. This module implements
it dependency-free (no bs4/lxml in this environment — and none
needed: the extraction semantics a data pipeline wants are a small,
well-defined subset of HTML parsing):

- a LINEAR SCANNER (not regex substitution chains): raw-text
  elements (``<script>``/``<style>``) skipped wholesale including
  any markup-lookalike content inside them, comments dropped even
  when they contain fake tags, attribute values scanned
  quote-aware so a ``>`` inside ``data-x='a>b'`` does not
  terminate the tag, character/numeric entity decoding via the
  stdlib table, case-insensitive tag names;
- BLOCK SEGMENTATION: block-level tags (``p div h1..h6 li tr
  title ...``) delimit text blocks; whitespace inside a block —
  including source newlines, which are NOT line breaks in HTML —
  collapses to single spaces; empty blocks drop;
- LINK DENSITY per block (fraction of non-whitespace characters
  under an ``<a>`` element), the classic content-extraction signal:
  :func:`strip_boilerplate_text` drops short, link-heavy blocks
  (nav bars, footers, tag clouds) and keeps prose.

Scale shape: extraction runs inside an Arrow-batched
``mapInPandas`` kernel — per-document Python work, embarrassingly
parallel, no shuffle; filters/projections compose lazily on the
extracted column. The reference has no web-ingest surface (its
corpus arrives as rows); this is engine-side plumbing a 100 TB web
pipeline needs, same posture as the media codecs.

Oracle discipline (same as the media fixtures): the driver-checked
entry fabricates HTML from the documents table through four
markup-flavor templates that all carry the SAME text payload, so
the DuckDB oracle regenerates the EXPECTED extraction directly
from the source column and never parses HTML — any scanner bug
(raw-text skip, comment walk, quoted ``>``, entity decode, block
segmentation, whitespace collapse) breaks value parity.
"""

from __future__ import annotations

import html as _htmlmod
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: tags that delimit text blocks (line breaks in the extraction) —
#: the conventional display:block / table / heading set plus <br>
_BLOCK_TAGS = frozenset(
    """p div br hr h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead
    tbody tr td th caption nav header footer article section aside
    main title blockquote pre form fieldset figure figcaption
    address""".split()
)
#: raw-text elements: content is NOT markup, skip to the closing tag
_RAWTEXT_TAGS = frozenset({"script", "style"})

_ENTITY_RE = re.compile(r"&(?:#\d{1,8}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{0,30});")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def _find_tag_end(html: str, pos: int) -> int:
    """Index of the ``>`` closing the tag whose attributes start at
    ``pos``, skipping quoted attribute values (a ``>`` inside
    ``href="a>b"`` is data, not the tag end). -1 when truncated."""
    n = len(html)
    while pos < n:
        c = html[pos]
        if c == ">":
            return pos
        if c in ('"', "'"):
            close = html.find(c, pos + 1)
            if close < 0:
                return -1
            pos = close + 1
        else:
            pos += 1
    return -1


def extract_html_blocks(html: str) -> list[tuple[str, float]]:
    """Scan ``html`` → list of ``(text_block, link_char_fraction)``.
    Blocks are delimited by block-level tags; within a block all
    whitespace runs (including source newlines) collapse to single
    spaces and the block is stripped; empty blocks drop. The link
    fraction counts non-whitespace characters that sit under an
    ``<a>`` element. Total over arbitrary byte soup: unknown tags
    strip silently, a truncated tag/comment/raw-text element drops
    the remainder, a bare ``<`` or ``&`` that opens nothing is
    literal text."""
    low = html.lower()
    n = len(html)
    parts: list[tuple[str, bool] | None] = []  # None = block break
    anchor = 0
    i = 0
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
                continue
            j = i + 1
            closing = j < n and html[j] == "/"
            if closing:
                j += 1
            k = j
            while k < n and (html[k].isalnum() or html[k] == "-"):
                k += 1
            name = low[j:k]
            if not name or (html[j].isdigit() if j < n else True):
                # "<3", "< ", "</>", trailing "<": literal text
                parts.append(("<", anchor > 0))
                i += 1
                continue
            end = _find_tag_end(html, k)
            if end < 0:
                break  # truncated tag: drop the remainder
            i = end + 1
            if not closing and name in _RAWTEXT_TAGS:
                close = low.find("</" + name, i)
                if close < 0:
                    break  # unterminated raw text: drop the remainder
                gt = low.find(">", close)
                i = n if gt < 0 else gt + 1
                parts.append(None)  # script/style are block-level
                continue
            if name == "a":
                anchor = anchor + 1 if not closing else max(0, anchor - 1)
            if name in _BLOCK_TAGS:
                parts.append(None)
        elif c == "&":
            m = _ENTITY_RE.match(html, i)
            if m:
                parts.append((_htmlmod.unescape(m.group(0)), anchor > 0))
                i = m.end()
            else:
                parts.append(("&", anchor > 0))
                i += 1
        else:
            nxt_lt = html.find("<", i)
            nxt_amp = html.find("&", i)
            j = min(x for x in (nxt_lt, nxt_amp, n) if x >= 0)
            parts.append((html[i:j], anchor > 0))
            i = j

    blocks: list[tuple[str, float]] = []
    cur: list[tuple[str, bool]] = []

    def flush() -> None:
        if not cur:
            return
        text = _WS_RE.sub(" ", "".join(t for t, _ in cur)).strip()
        if text:
            total = sum(len(_WS_RE.sub("", t)) for t, _ in cur)
            linked = sum(len(_WS_RE.sub("", t)) for t, in_a in cur if in_a)
            blocks.append((text, linked / total if total else 0.0))
        cur.clear()

    for part in parts:
        if part is None:
            flush()
        else:
            cur.append(part)
    flush()
    return blocks


def extract_html_text(html: str) -> str:
    """Full text extraction: every block, newline-joined (tag
    stripping + entity decode + block segmentation + whitespace
    normalization — no boilerplate judgment)."""
    return "\n".join(text for text, _ in extract_html_blocks(html))


def strip_boilerplate_text(
    html: str, *, max_link_frac: float = 0.66, min_chars: int = 80
) -> str:
    """Content extraction: drop blocks that are BOTH short (<
    ``min_chars``) and link-dominated (> ``max_link_frac`` of
    non-whitespace characters inside anchors) — the nav/footer/menu
    signature — keep everything else. Long blocks survive any link
    density (a citation-dense paragraph is content)."""
    return "\n".join(
        text
        for text, link_frac in extract_html_blocks(html)
        if len(text) >= min_chars or link_frac <= max_link_frac
    )


# ---------------------------------------------------------------------------
# Spark seam

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def html_extract(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    strip_boilerplate: bool = False,
) -> DataFrame:
    """``(id, html)`` rows → ``(doc_id, text)`` via the scanner in an
    Arrow-batched ``mapInPandas`` kernel (per-document work, no
    shuffle — the plan stays a narrow scan).
    ``strip_boilerplate=True`` additionally drops short
    link-dominated blocks (:func:`strip_boilerplate_text`) — the
    per-page heuristic, complementary to the corpus-level
    ``dedup_lines`` pass."""
    extract = strip_boilerplate_text if strip_boilerplate else extract_html_text

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "text": [extract(h) for h in pdf[html_col]],
                }
            )

    return df.select(id_col, html_col).mapInPandas(kernel, _EXTRACT_SCHEMA)


#: the entity line every flavor carries — decodes to
#: ``Tom & Jerry <"quoted'>`` (named, numeric-decimal entities)
_ENTITY_LINE = "Tom &amp; Jerry &lt;&quot;quoted&#39;&gt;"

_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("html", T.StringType(), False),
    ]
)


def html_page_table(documents: DataFrame) -> DataFrame:
    """Fabricate a deterministic HTML page per document, rotating
    four MARKUP flavors on ``doc_id % 4`` that all extract to the
    IDENTICAL text (title line, the document text, an entity line,
    an anchor line) — so one SQL oracle covers every flavor while
    the scanner has to survive: attribute soup with a quoted ``>``
    and uppercase tags (flavor 1), comment traps and a script whose
    body contains fake markup (flavor 2), a style element and
    nested inline tags splitting the entity line (flavor 3)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pages = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                esc = _htmlmod.escape(str(text))
                title = f"Doc {d}"
                if d % 4 == 0:
                    page = (
                        f"<html><head><title>{title}</title></head><body>"
                        f"<p>{esc}</p><p>{_ENTITY_LINE}</p>"
                        f'<p><a href="/more">Read more</a></p></body></html>'
                    )
                elif d % 4 == 1:
                    page = (
                        f"<HTML><HEAD><TITLE id=\"t\" data-x='a>b'>{title}"
                        f'</TITLE></HEAD><BODY class="main">'
                        f'<P STYLE="color: red">{esc}</P>'
                        f"<p>{_ENTITY_LINE}</p>"
                        f'<P><A HREF="/more" target="_blank">Read more</A></P>'
                        f"<BR/></BODY></HTML>"
                    )
                elif d % 4 == 2:
                    page = (
                        f"<html><!-- <p>fake paragraph</p> --><head>"
                        f"<title>{title}</title>"
                        f'<script type="text/javascript">var s = "<p>not text</p>";'
                        f' if (a < b) {{ x("&amp;"); }}</script></head>'
                        f"<body><p>{esc}</p>"
                        f"<!--\ncomment with a newline and <div>junk</div>\n-->"
                        f"<p>{_ENTITY_LINE}</p>"
                        f'<p><a href="/more">Read more</a></p></body></html>'
                    )
                else:
                    page = (
                        f"<html><head><title>{title}</title>"
                        f"<style>p > a {{ color: blue; }} /* <p>nope</p> */</style>"
                        f"</head><body><p><b><i>{esc}</i></b></p>"
                        f"<p><em>Tom</em> &amp; <strong>Jerry</strong>"
                        f" &lt;&quot;quoted&#39;&gt;</p>"
                        f'<p><a href="/more"><span>Read more</span></a></p>'
                        f"</body></html>"
                    )
                pages.append(page)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "html": pages})

    return documents.select("doc_id", "text").mapInPandas(kernel, _PAGE_SCHEMA)


def html_text_stats(extracted: DataFrame) -> DataFrame:
    """Extraction fingerprint per document: md5 of the text, line
    count, character count — all JVM-side expressions over the
    extracted column (the comparison surface the oracle
    regenerates)."""
    return extracted.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "\n", "")) + 1
        ).cast("long").alias("n_lines"),
        F.length("text").cast("long").alias("n_chars"),
    )
