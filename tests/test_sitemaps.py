"""Sitemap parser (operators/sitemaps.py): block splitting, CDATA
verbatim vs entity decode, field trimming/defaulting, and both
document kinds — checked against handwritten edge cases AND
``xml.etree.ElementTree`` (a conforming XML engine this repo did not
write) over md5-randomized well-formed sitemaps, the same
independent-oracle discipline the robots and PNG tests use."""

from __future__ import annotations

import hashlib
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from coltt_spark.operators.sitemaps import sitemap_entries, sitemap_kind


def _parse_all(spark, xmls: list[str]) -> list[tuple[str, list[dict]]]:
    """Run the Catalyst parser over the documents → [(kind, entries)]
    in input order."""
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xmls)], ["i", "xml"]
    )
    rows = (
        df.select(
            "i",
            sitemap_kind(F.col("xml")).alias("kind"),
            sitemap_entries(F.col("xml")).alias("es"),
        )
        .orderBy("i")
        .collect()
    )
    out = []
    for r in rows:
        out.append(
            (
                r["kind"],
                [
                    {
                        "loc": e["loc"],
                        "lastmod": e["lastmod_s"] or None,
                        "changefreq": e["changefreq"],
                        "priority": e["priority"],
                    }
                    for e in r["es"]
                ],
            )
        )
    return out


# -- independent reference: ElementTree (namespace-agnostic walk) -----------

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _et_entries(xml: str) -> tuple[str, list[dict]]:
    root = ET.fromstring(xml)
    kind = "index" if _local(root.tag) == "sitemapindex" else "urlset"
    child_tag = "sitemap" if kind == "index" else "url"
    entries = []
    for node in root:
        if _local(node.tag) != child_tag:
            continue

        def text(name: str) -> str | None:
            for c in node:
                if _local(c.tag) == name:
                    # ET decodes entities and splices CDATA already;
                    # apply the module's documented \s trim
                    return (c.text or "").strip()
            return None

        lastmod = text("lastmod")
        freq = text("changefreq")
        prio = text("priority")
        entries.append(
            {
                "loc": text("loc") or "",
                "lastmod": lastmod[:10] if lastmod else None,
                "changefreq": freq.lower() if freq else None,
                "priority": float(prio) if prio else 0.5,
            }
        )
    return kind, entries


# -- handwritten edge cases --------------------------------------------------

EDGE_CASES = [
    # CDATA is verbatim: the literal text `&amp;` inside CDATA must
    # SURVIVE undecoded (outside CDATA it would decode to `&`)
    (
        '<urlset><url><loc><![CDATA[https://e.com/a?x=1&y=2&amp;z]]></loc>'
        "</url></urlset>",
        ("urlset", [("https://e.com/a?x=1&y=2&amp;z", None, None, 0.5)]),
    ),
    # escaped escape: &amp;lt; decodes to the literal &lt; (amp LAST)
    (
        "<urlset><url><loc>https://e.com/?q=&amp;lt;tag&amp;gt;</loc>"
        "</url></urlset>",
        ("urlset", [("https://e.com/?q=&lt;tag&gt;", None, None, 0.5)]),
    ),
    # numeric character references: decimal, hex (either case), and an
    # astral codepoint; &#38;lt; yields the literal &lt; (single pass)
    (
        "<urlset><url><loc>https://e.com&#x2F;p?q=&#38;lt;&#x26;r=&#233;"
        "&amp;s=&#x1F600;</loc></url></urlset>",
        ("urlset", [("https://e.com/p?q=&lt;&r=é&s=\U0001f600", None, None, 0.5)]),
    ),
    # invalid numeric refs pass through verbatim (lenient; NOT fed to
    # the ElementTree cross-check below — a conforming parser rejects
    # the document outright)
    # attribute noise everywhere + newline-indented values + full W3C
    # datetime + case-varied changefreq
    (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        '  <url data-k="1">\n'
        "    <loc>\n      https://e.com/p1\n    </loc>\n"
        "    <lastmod>2024-03-05T12:30:00+00:00</lastmod>\n"
        "    <changefreq> WEEKLY </changefreq>\n"
        "    <priority> 0.8 </priority>\n"
        "  </url>\n"
        "</urlset>",
        ("urlset", [("https://e.com/p1", "2024-03-05", "weekly", 0.8)]),
    ),
    # empty urlset
    ("<urlset></urlset>", ("urlset", [])),
    # url with no loc: '' (the caller's filter/normalize drops it)
    (
        "<urlset><url><priority>0.2</priority></url></urlset>",
        ("urlset", [("", None, None, 0.2)]),
    ),
    # two locs in one entry: the first wins (both engines)
    (
        "<urlset><url><loc>https://e.com/first</loc>"
        "<loc>https://e.com/second</loc></url></urlset>",
        ("urlset", [("https://e.com/first", None, None, 0.5)]),
    ),
    # index document: subset schema, lastmod optional
    (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://e.com/s-0.xml</loc>"
        "<lastmod>2024-01-31</lastmod></sitemap>"
        "<sitemap><loc>https://e.com/s-1.xml</loc></sitemap>"
        "</sitemapindex>",
        (
            "index",
            [
                ("https://e.com/s-0.xml", "2024-01-31", None, 0.5),
                ("https://e.com/s-1.xml", None, None, 0.5),
            ],
        ),
    ),
]


def test_edge_cases(spark):
    got = _parse_all(spark, [x for x, _ in EDGE_CASES])
    for (xml, (kind, want)), (gkind, gentries) in zip(EDGE_CASES, got):
        assert gkind == kind, xml
        assert len(gentries) == len(want), xml
        for g, (loc, lastmod, freq, prio) in zip(gentries, want):
            assert g["loc"] == loc, xml
            assert g["lastmod"] == lastmod, xml
            assert g["changefreq"] == freq, xml
            assert abs(g["priority"] - prio) < 1e-12, xml


def test_edge_cases_match_elementtree(spark):
    """Every handwritten case must also agree with ElementTree —
    pins that the documented contract IS conforming-XML behavior,
    not private convention."""
    xmls = [x for x, _ in EDGE_CASES]
    got = _parse_all(spark, xmls)
    for xml, (gkind, gentries) in zip(xmls, got):
        kind, want = _et_entries(xml)
        assert gkind == kind, xml
        assert gentries == want, xml


# -- randomized conformance fuzz against ElementTree -------------------------

def _r(seed: str, n: int) -> int:
    return int(hashlib.md5(seed.encode()).hexdigest(), 16) % n


_PADS = ["", " ", "\n  ", "\n\t  "]
_FREQS = ["always", "Hourly", "DAILY", "weekly", "monthly", "never"]


def _fuzz_doc(i: int) -> str:
    """A random well-formed sitemap: entry counts, CDATA/plain locs,
    escaped queries, optional fields, attribute noise, and whitespace
    all md5-derived."""
    is_index = _r(f"{i}:kind", 4) == 0
    n = _r(f"{i}:n", 5)
    tag, root = ("sitemap", "sitemapindex") if is_index else ("url", "urlset")
    parts = [
        f'<{root} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for j in range(n):
        s = f"{i}:{j}"
        attr = ' data-x="1"' if _r(s + "a", 3) == 0 else ""
        path = f"/d{_r(s + 'p', 50)}/p{j}"
        if _r(s + "q", 3) == 0:
            c = _r(s + "c", 4)
            if c == 0:
                loc = f"<loc><![CDATA[https://f{i}.com{path}?a={j}&b={j}]]></loc>"
            elif c == 1:
                loc = f"<loc>https://f{i}.com{path}?a={j}&amp;b={j}</loc>"
            elif c == 2:
                # decimal numeric character references (&#38; = &,
                # &#47; = /) — ElementTree decodes these; the parser
                # must agree
                loc = f"<loc>https://f{i}.com{path}?a={j}&#38;b={j}&#38;c=&#233;</loc>"
            else:
                # hex refs (lowercase x — capital X is not well-formed
                # XML and ET rejects it; the parser tolerates it as a
                # documented leniency), incl. an astral codepoint
                loc = (
                    f"<loc>https://f{i}.com{path.replace('/', '&#x2F;', 1)}"
                    f"?a={j}&#x26;e=&#x1F600;</loc>"
                )
        else:
            pad = _PADS[_r(s + "w", 4)]
            loc = f"<loc>{pad}https://f{i}.com{path}{pad}</loc>"
        fields = [loc]
        if _r(s + "lm", 3) != 0:
            d = f"2023-{1 + _r(s + 'mo', 12):02d}-{1 + _r(s + 'dy', 28):02d}"
            if _r(s + "t", 2) == 0:
                d += f"T{_r(s + 'h', 24):02d}:00:00Z"
            fields.append(f"<lastmod>{d}</lastmod>")
        if not is_index:
            if _r(s + "cf", 3) == 0:
                fields.append(
                    f"<changefreq>{_FREQS[_r(s + 'f', len(_FREQS))]}</changefreq>"
                )
            if _r(s + "pr", 3) == 0:
                fields.append(f"<priority>0.{_r(s + 'pv', 10)}</priority>")
        pad = _PADS[_r(s + "ep", 4)]
        parts.append(f"<{tag}{attr}>{pad}" + pad.join(fields) + f"{pad}</{tag}>")
    parts.append(f"</{root}>")
    return "\n".join(parts)


def test_numeric_ref_leniency(spark):
    """Documented leniencies a conforming XML parser cannot share
    (ET rejects the document outright): capital-X hex refs decode,
    invalid codepoints (0, surrogates, > U+10FFFF) and bare ``&#``
    pass through verbatim instead of failing the row."""
    from coltt_spark.operators.sitemaps import xml_unescape

    cases = {
        "a&#X2F;b": "a/b",
        "x&#0;y": "x&#0;y",
        "s&#xD800;t": "s&#xD800;t",
        "o&#1114112;v": "o&#1114112;v",
        "bare&#x;q": "bare&#x;q",
        "tail&#": "tail&#",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["t"])
    got = {
        r["t"]: r["d"]
        for r in df.select("t", xml_unescape(F.col("t")).alias("d")).collect()
    }
    assert got == cases


def test_fuzz_against_elementtree(spark):
    xmls = [_fuzz_doc(i) for i in range(80)]
    got = _parse_all(spark, xmls)
    n_entries = 0
    for xml, (gkind, gentries) in zip(xmls, got):
        kind, want = _et_entries(xml)
        assert gkind == kind, xml
        assert gentries == want, xml
        n_entries += len(want)
    assert n_entries > 80  # the fuzz actually exercised entries
