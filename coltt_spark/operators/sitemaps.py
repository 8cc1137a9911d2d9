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
escaped, so no entity decoding is applied), and the five predefined
XML entities (``&amp; &lt; &gt; &quot; &apos;``) in plain text
content — ``&amp;`` in a loc is the spec-REQUIRED way to write ``&``
in a query string, so skipping entity decode silently corrupts every
multi-parameter URL.

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

#: the five predefined XML entities. ``&amp;`` decodes LAST so the
#: escaped-escape ``&amp;lt;`` correctly yields the literal ``&lt;``
#: (decoding ``&amp;`` first would re-expose an ``&lt;`` for the next
#: pass to corrupt).
XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape(text: Column) -> Column:
    """Decode the five predefined XML entities (literal replaces —
    stays inside whole-stage codegen)."""
    out = text
    for ent, ch in XML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


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
