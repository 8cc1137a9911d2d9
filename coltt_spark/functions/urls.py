"""URL primitives for web-corpus pipelines.

The steps every crawled-corpus pipeline (C4 / RefinedWeb / Dolma
style) runs between WARC ingestion and text processing: URL
NORMALIZATION (the dedup key — crawls see the same page under
case-varied hosts, default ports, tracking parameters, and
fragments), HOST / REGISTRABLE-DOMAIN extraction (the blocklist and
per-domain-quota key), and URL-level deduplication.

Everything here is a native Catalyst expression (regexp / array
functions — JVM-side, codegen'd, NO Python in the hot path) with an
exact DuckDB-SQL equivalent, same discipline as
:mod:`coltt_spark.functions.text` — so the operators stay
oracle-checkable and the scan stays whole-stage-codegen at 100 TB.

Normalization contract (documented, deterministic, both engines):

1. scheme and host lowercase (RFC 3986 §6.2.2.1 — they are
   case-insensitive; the path is NOT touched, it is case-sensitive);
2. default ports stripped (``:80`` for http, ``:443`` for https);
3. the fragment dropped (``#...`` is client-side only);
4. tracking query parameters removed (``utm_*``, ``fbclid``,
   ``gclid``, ``ref`` — the industry-standard noise set), other
   parameters kept IN ORDER (no reordering — parameter order can be
   semantic);
5. an empty path becomes ``/``.

Registrable-domain extraction uses a documented SMALL-TABLE
heuristic (last two labels, or last three under common two-level
public suffixes: ``co.uk``-style ccTLD registries) — the full
Public Suffix List is a data file, not an algorithm; the heuristic
covers the overwhelming bulk of crawl traffic and is exactly
replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: one regexp splits a URL into (scheme, hostport, path, query, fragment)
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

#: query parameters dropped during normalization
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

#: two-level public suffixes the registrable-domain heuristic knows
#: (the high-traffic ccTLD second-level registries)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme, '' when the value does not parse as a URL."""
    return F.lower(F.regexp_extract(url, URL_RE, 1))


def url_host(url: Column) -> Column:
    """Lower-cased host with any explicit port removed, '' on a
    non-URL. (Ports are split off before lowercasing so the port
    digits never matter.)"""
    hostport = F.lower(F.regexp_extract(url, URL_RE, 2))
    return F.regexp_replace(hostport, r":\d*$", "")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: the last two labels, or the last three when
    the last two form a known two-level public suffix (``co.uk``
    family). A single-label host (``localhost``) is returned
    whole."""
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).when(
        two.isin(*TWO_LEVEL_SUFFIXES) & (three != ""), three
    ).otherwise(two)


def url_normalize(url: Column) -> Column:
    """Apply the five-step normalization contract (module docstring)
    → the canonical URL string, NULL-free ('' stays '')."""
    scheme = url_scheme(url)
    hostport = F.lower(F.regexp_extract(url, URL_RE, 2))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(url, URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_replace(F.regexp_extract(url, URL_RE, 4), r"^\?", "")
    kept = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(kept, "&")
    return F.when(scheme == "", url).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )


# -- DuckDB replay fragments (oracle side of the contract) ------------------

#: DuckDB expression replaying url_host({x})
DD_URL_HOST = (
    "regexp_replace(lower(regexp_extract({x}, "
    "'^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$', 2)), "
    "':[0-9]*$', '')"
)

#: DuckDB expression replaying registrable_domain(host) for {h}
DD_REGISTRABLE_DOMAIN = (
    "CASE WHEN regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) = '' THEN {h} "
    "WHEN regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) IN ('"
    + "', '".join(TWO_LEVEL_SUFFIXES)
    + "') AND regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> '' "
    "THEN regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+)$', 1) "
    "ELSE regexp_extract({h}, '([^.]+\\.[^.]+)$', 1) END"
)

#: DuckDB expression replaying url_normalize({x})
DD_URL_NORMALIZE = (
    "CASE WHEN lower(regexp_extract({x}, '{re}', 1)) = '' THEN {x} ELSE "
    "lower(regexp_extract({x}, '{re}', 1)) || '://' || "
    "CASE lower(regexp_extract({x}, '{re}', 1)) "
    " WHEN 'http' THEN regexp_replace(lower(regexp_extract({x}, '{re}', 2)), ':80$', '') "
    " WHEN 'https' THEN regexp_replace(lower(regexp_extract({x}, '{re}', 2)), ':443$', '') "
    " ELSE lower(regexp_extract({x}, '{re}', 2)) END || "
    "CASE WHEN regexp_extract({x}, '{re}', 3) = '' THEN '/' "
    " ELSE regexp_extract({x}, '{re}', 3) END || "
    "CASE WHEN coalesce(array_to_string(list_filter(string_split("
    "  regexp_replace(regexp_extract({x}, '{re}', 4), '^\\?', ''), '&'),"
    "  p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=')), '&'), '') = '' "
    " THEN '' ELSE '?' || coalesce(array_to_string(list_filter(string_split("
    "  regexp_replace(regexp_extract({x}, '{re}', 4), '^\\?', ''), '&'),"
    "  p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=')), '&'), '') END "
    "END"
).replace(
    "{re}", "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"
)
