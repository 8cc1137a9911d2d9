"""Sitemap (sitemaps.org XML) parsing for web-corpus pipelines.

The third leg of the crawl-frontier trio this engine already ships —
URL normalization/dedup (:mod:`coltt_spark.functions.urls`) and the
robots.txt politeness gate (:mod:`coltt_spark.operators.robots`):
sitemaps are where a crawl DISCOVERS urls before fetching them, and
web corpora (Common Crawl seed lists, site-scoped refreshes) start
from exactly this file. The reference has no web surface; this is
pipeline-ambition shared with the rest of the web block.

Scope is the sitemaps.org 0.9 protocol, both document kinds:

- ``<urlset>`` — leaf sitemaps: ``<url>`` entries with ``<loc>``
  (required), ``<lastmod>`` (W3C datetime — the DATE prefix is
  parsed, the optional time-of-day is protocol-legal and ignored),
  ``<changefreq>``, and ``<priority>`` (protocol default 0.5 when
  absent);
- ``<sitemapindex>`` — index sitemaps: ``<sitemap>`` entries with
  ``<loc>`` and optional ``<lastmod>``.

Parsing tolerates the variation real sitemaps exhibit: attribute
noise on any tag (``xmlns`` on the root is universal), arbitrary
whitespace inside elements, ``<![CDATA[...]]>`` wrapped locs
(verbatim — the whole point of CDATA is that nothing inside it is
escaped, so no entity decoding is applied), the five predefined
XML entities (``&amp; &lt; &gt; &quot; &apos;``) in plain text
content — ``&amp;`` in a loc is the spec-REQUIRED way to write ``&``
in a query string, so skipping entity decode silently corrupts every
multi-parameter URL — and decimal/hex numeric character references
(``&#38;``, ``&#x2F;``), equally XML-legal and emitted by real
sitemap generators; invalid codepoints pass through verbatim.

Everything is a native Catalyst expression (``regexp_extract_all``
block split + a ``transform`` over the blocks — JVM-side, codegen'd,
NO Python and NO shuffle), same discipline as the robots parser: a
sitemap table at 100 TB scale parses as a narrow projection, and the
extracted locs feed straight into ``url_normalize`` /
``registrable_domain`` / the robots gate without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: entry blocks — (?s) so entries spanning lines match; (?:\s[^>]*)?
#: tolerates attribute noise without also matching longer tag names
#: (<url> never swallows an <urlset>); non-greedy body so adjacent
#: entries split correctly
URL_BLOCK_RE = r"(?s)<url(?:\s[^>]*)?>(.*?)</url\s*>"
SITEMAP_BLOCK_RE = r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap\s*>"

LOC_RE = r"(?s)<loc(?:\s[^>]*)?>(.*?)</loc\s*>"
LASTMOD_RE = r"(?s)<lastmod(?:\s[^>]*)?>(.*?)</lastmod\s*>"
CHANGEFREQ_RE = r"(?s)<changefreq(?:\s[^>]*)?>(.*?)</changefreq\s*>"
PRIORITY_RE = r"(?s)<priority(?:\s[^>]*)?>(.*?)</priority\s*>"

#: a loc whose (trimmed) content is a single CDATA section
CDATA_RE = r"(?s)^<!\[CDATA\[(.*)\]\]>$"

#: the five predefined XML entities
XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: numeric character references (XML 1.0 §4.1): decimal ``&#38;`` and
#: hex ``&#x2F;``. Bounded digit runs keep the regex linear; 7 decimal
#: / 6 hex digits comfortably cover U+10FFFF.
DEC_REF_RE = r"^&#([0-9]{1,7});"
HEX_REF_RE = r"^&#[xX]([0-9a-fA-F]{1,6});"


def _codepoint_char(cp: Column, verbatim: Column) -> Column:
    """Unicode codepoint (int column) → one-character string, via
    UTF-16BE bytes — a surrogate pair above the BMP — entirely in
    codegen'd builtins (Spark has no codepoint→char builtin; ``char``
    truncates to 256). Invalid codepoints (0, surrogates,
    > U+10FFFF) yield ``verbatim`` — the undecoded reference text —
    rather than failing the row (lenient, like real crawlers)."""
    bmp = F.decode(F.unhex(F.lpad(F.hex(cp), 4, "0")), "UTF-16BE")
    off = cp - F.lit(0x10000)
    hi = F.lit(0xD800) + F.shiftright(off, 10)
    lo = F.lit(0xDC00) + off.bitwiseAND(F.lit(0x3FF))
    astral = F.decode(
        F.unhex(
            F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
        ),
        "UTF-16BE",
    )
    valid = (
        (cp >= F.lit(1))
        & (cp <= F.lit(0x10FFFF))
        & ~((cp >= F.lit(0xD800)) & (cp <= F.lit(0xDFFF)))
    )
    return F.when(
        valid, F.when(cp <= F.lit(0xFFFF), bmp).otherwise(astral)
    ).otherwise(verbatim)


def _decode_segment(seg: Column) -> Column:
    """Decode the leading reference of one ``&``-anchored segment:
    one of the five named entities, a decimal reference, or a hex
    reference — else the segment verbatim. Each segment holds at most
    one reference (the split is on every ``&``), so decoding is
    single-pass by construction: ``&amp;lt;`` yields the literal
    ``&lt;`` and ``&#38;lt;`` the literal ``&lt;`` — decoded text is
    never re-scanned."""
    out = seg
    for ent, ch in XML_ENTITIES:
        out = F.when(
            seg.startswith(ent),
            F.concat(F.lit(ch), F.substr(seg, F.lit(len(ent) + 1))),
        ).otherwise(out)
    dec_digits = F.nullif(F.regexp_extract(seg, DEC_REF_RE, 1), F.lit(""))
    hex_digits = F.nullif(F.regexp_extract(seg, HEX_REF_RE, 1), F.lit(""))
    out = F.when(
        dec_digits.isNotNull(),
        F.concat(
            _codepoint_char(
                dec_digits.cast("int"),
                F.concat(F.lit("&#"), dec_digits, F.lit(";")),
            ),
            F.substr(seg, F.length(dec_digits) + F.lit(4)),
        ),
    ).otherwise(out)
    out = F.when(
        hex_digits.isNotNull(),
        F.concat(
            _codepoint_char(
                F.conv(hex_digits, 16, 10).cast("int"),
                # re-extract the verbatim ref (preserves x/X case)
                F.regexp_extract(seg, r"^(&#[xX][0-9a-fA-F]{1,6};)", 1),
            ),
            F.substr(seg, F.length(hex_digits) + F.lit(5)),
        ),
    ).otherwise(out)
    return out


def xml_unescape(text: Column) -> Column:
    """Decode the five predefined XML entities plus decimal/hex
    numeric character references (``&#38;``, ``&#x2F;`` — XML-legal
    and common in real sitemap locs). Single pass: split before every
    ``&`` (zero-width lookahead — Java split emits no leading empty
    for a zero-width match at position 0), decode each segment's
    leading reference, rejoin. All scalar builtins — stays inside
    whole-stage codegen, no Python, no shuffle."""
    segs = F.split(text, r"(?=&)", -1)
    return F.array_join(F.transform(segs, _decode_segment), "")


def sitemap_kind(xml: Column) -> Column:
    """``'index'`` for a ``<sitemapindex>`` document, ``'urlset'``
    otherwise (leaf sitemaps; the protocol default)."""
    return F.when(
        xml.rlike(r"(?s)<sitemapindex[\s>]"), F.lit("index")
    ).otherwise(F.lit("urlset"))


def _text_field(block: Column, pattern: str) -> Column:
    """Trimmed text content of the first ``pattern`` element in the
    block; '' when the element is absent. (``F.trim`` strips only
    spaces — sitemap elements are routinely newline-indented, so trim
    the full ``\\s`` class.)"""
    return F.regexp_replace(
        F.regexp_extract(block, pattern, 1), r"^\s+|\s+$", ""
    )


def _loc(block: Column) -> Column:
    """The entry's ``<loc>``: CDATA content verbatim (CDATA is
    unescaped by definition), plain content entity-decoded."""
    raw = _text_field(block, LOC_RE)
    return F.when(
        raw.rlike(CDATA_RE), F.regexp_replace(raw, CDATA_RE, "$1")
    ).otherwise(xml_unescape(raw))


def _entry(block: Column) -> Column:
    lastmod = F.nullif(_text_field(block, LASTMOD_RE), F.lit(""))
    freq = F.nullif(F.lower(_text_field(block, CHANGEFREQ_RE)), F.lit(""))
    prio = F.coalesce(
        F.nullif(_text_field(block, PRIORITY_RE), F.lit("")).cast("double"),
        F.lit(0.5),
    )
    return F.struct(
        _loc(block).alias("loc"),
        # W3C datetime: the date is the first 10 chars whether or not
        # a time-of-day follows (2024-03-05 / 2024-03-05T12:30:00Z)
        F.to_date(F.substring(lastmod, 1, 10)).alias("lastmod"),
        # the same date as a plain string — oracle-facing outputs use
        # this form (a DATE column round-trips through the driver's
        # pandas fetch as a timestamp and type-mismatches)
        F.substring(lastmod, 1, 10).alias("lastmod_s"),
        freq.alias("changefreq"),
        prio.alias("priority"),
    )


def sitemap_entries(xml: Column) -> Column:
    """Parse one sitemap document → array of entry structs
    ``(loc string, lastmod date, changefreq string, priority
    double)`` in document order. ``<urlset>`` documents yield their
    ``<url>`` entries, ``<sitemapindex>`` documents their
    ``<sitemap>`` children (lastmod optional, changefreq NULL,
    priority the 0.5 default — the index schema is a subset)."""
    blocks = F.when(
        sitemap_kind(xml) == "index",
        F.regexp_extract_all(xml, F.lit(SITEMAP_BLOCK_RE), F.lit(1)),
    ).otherwise(F.regexp_extract_all(xml, F.lit(URL_BLOCK_RE), F.lit(1)))
    return F.transform(blocks, _entry)
