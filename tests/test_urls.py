"""URL normalization cross-engine contract: the Catalyst expressions
and the exported DuckDB replay fragments must agree on ARBITRARY
messy URLs, not just the fixture's shapes — plus normalization
idempotence (a canonical URL re-normalizes to itself)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from coltt_spark.functions.urls import (
    DD_REGISTRABLE_DOMAIN,
    DD_URL_HOST,
    DD_URL_NORMALIZE,
    registrable_domain,
    url_host,
    url_normalize,
)


def _messy_urls(n: int = 300) -> list[str]:
    """Deterministic generator of adversarial URL shapes: case soup,
    ports (default and not), userinfo-free hosts of 1-4 labels over
    mixed suffixes, paths with case/encoded chars/trailing slashes,
    query params in every tracking/non-tracking arrangement (incl.
    empty values, bare '&', '=' in values), fragments, and a few
    non-URLs that must pass through untouched."""
    import random

    rng = random.Random(1234)
    schemes = ["http", "HTTP", "https", "HTTPS", "hTtPs", "ftp"]
    hosts = [
        "Example.COM", "example.com", "BLOG.Example.co.UK",
        "news.example.org", "a.b.c.example.com.au", "localhost",
        "x.co.uk", "sub.x.ac.uk", "EXAMPLE.ORG",
        # PSL classes: unknown-to-the-old-heuristic two-level
        # registries, private-section suffixes, wildcard + exception
        "shop.foo.co.nz", "foo.com.tw", "x.co.id", "user.GitHub.io",
        "deep.k12.ca.us", "bar.foo.ck", "www.ck", "sub.www.ck",
        "b.a.np", "bucket.s3.amazonaws.com", "app.blogspot.com",
    ]
    ports = ["", ":80", ":443", ":8080", ":"]
    paths = ["", "/", "/A/B", "/path/", "/Path%20X/y.html", "//double"]
    params = [
        "id=5", "utm_source=feed", "utm_campaign=X", "gclid=abc",
        "fbclid=1", "ref=rss", "q=a=b", "empty=", "keep_ref=1",
        "utm=bare", "UTM_SOURCE=case",
    ]
    frags = ["", "#top", "#Sec-2", "#utm_source=feed"]
    out = []
    for _ in range(n):
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        if q and rng.random() < 0.2:
            q += "&"  # trailing separator
        url = (
            rng.choice(schemes)
            + "://"
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + ("?" + q if q or rng.random() < 0.1 else "")
            + rng.choice(frags)
        )
        out.append(url)
    out += ["not a url", "", "relative/path", "mailto:x@example.com", "//schemeless.example.com/x"]
    return out


def test_url_normalize_matches_duckdb_on_messy_urls(spark):
    urls = _messy_urls()
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [
        (r["n"], r["h"], r["d"])
        for r in df.select(
            url_normalize(F.col("u")).alias("n"),
            url_host(F.col("u")).alias("h"),
            registrable_domain(url_host(F.col("u"))).alias("d"),
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    want = con.execute(
        f"SELECT {DD_URL_NORMALIZE.format(x='u')}, "
        f"{DD_URL_HOST.format(x='u')}, "
        f"{DD_REGISTRABLE_DOMAIN.format(h=DD_URL_HOST.format(x='u'))} FROM t"
    ).fetchall()
    for u, g, w in zip(urls, got, want):
        assert g == tuple(w), f"engines disagree on {u!r}: spark={g} duckdb={tuple(w)}"


def test_url_normalize_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u): the canonical form is
    a fixed point (dedup keys must be stable under re-processing)."""
    urls = _messy_urls(150)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        url_normalize(F.col("u")).alias("once"),
        url_normalize(url_normalize(F.col("u"))).alias("twice"),
    ).collect()
    for u, r in zip(urls, rows):
        assert r["once"] == r["twice"], f"not idempotent on {u!r}: {r['once']!r} -> {r['twice']!r}"


def test_url_normalize_pinned_cases():
    """The five-step contract on hand-picked shapes (engine-free
    documentation of the semantics)."""
    import duckdb as dd

    con = dd.connect()

    def norm(u: str) -> str:
        return con.execute(
            f"SELECT {DD_URL_NORMALIZE.format(x='u')} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]

    assert norm("HTTP://Example.COM:80/A?utm_source=x&id=1#f") == "http://example.com/A?id=1"
    assert norm("https://example.com:443") == "https://example.com/"
    assert norm("https://example.com:8080/x") == "https://example.com:8080/x"
    assert norm("http://example.com/?ref=rss") == "http://example.com/"
    assert norm("http://example.com/p?a=1&utm_x=2&b=3") == "http://example.com/p?a=1&b=3"
    assert norm("not a url") == "not a url"  # pass-through
    # path case preserved; param order preserved
    assert norm("http://X.com/CaseS?z=1&a=2") == "http://x.com/CaseS?z=1&a=2"


def test_registrable_domain_pinned_cases():
    import duckdb as dd

    con = dd.connect()

    def dom(h: str) -> str:
        return con.execute(
            f"SELECT {DD_REGISTRABLE_DOMAIN.format(h='h')} FROM (SELECT ? AS h)", [h]
        ).fetchone()[0]

    assert dom("blog.example.co.uk") == "example.co.uk"
    assert dom("example.co.uk") == "example.co.uk"
    assert dom("deep.sub.example.com") == "example.com"
    assert dom("example.com") == "example.com"
    assert dom("localhost") == "localhost"
    assert dom("a.b.example.com.au") == "example.com.au"
    assert dom("co.uk") == "co.uk"  # bare suffix stays whole
    # PSL-only cases the old heuristic got WRONG (ADVICE/VERDICT r6):
    assert dom("shop.foo.co.nz") == "foo.co.nz"
    assert dom("foo.com.tw") == "foo.com.tw"
    assert dom("x.co.id") == "x.co.id"
    assert dom("user.github.io") == "user.github.io"  # private section
    assert dom("github.io") == "github.io"            # bare suffix
    # 3-label rules
    assert dom("deep.k12.ca.us") == "deep.k12.ca.us"
    assert dom("school.ca.us") == "school.ca.us"
    assert dom("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com"
    assert dom("s3.amazonaws.com") == "s3.amazonaws.com"  # whole-host
    # wildcard *.ck and the !www.ck exception (the spec's own example)
    assert dom("bar.foo.ck") == "bar.foo.ck"
    assert dom("foo.ck") == "foo.ck"
    assert dom("www.ck") == "www.ck"
    assert dom("sub.www.ck") == "www.ck"
    assert dom("b.a.np") == "b.a.np"
    # tranche 7 (r13): .ua modern transliterations — both romanizations
    # now resolve at registry granularity
    assert dom("www.site.kyiv.ua") == "site.kyiv.ua"
    assert dom("site.kharkiv.ua") == "site.kharkiv.ua"
    assert dom("a.b.odesa.ua") == "b.odesa.ua"
    assert dom("shop.kiev.ua") == "shop.kiev.ua"  # the old form still
    # tranche 7: punycoded IDN second-level registries — the implicit
    # '*' default used to stop one label short on these
    assert (  # มหาวิทยาลัย.ศึกษา.ไทย (a university under ศึกษา.ไทย)
        dom("xn--12c1fe0br.xn--o3cw4h") == "xn--12c1fe0br.xn--o3cw4h"
    )  # bare suffix stays whole
    assert (
        dom("uni.xn--12c1fe0br.xn--o3cw4h")
        == "uni.xn--12c1fe0br.xn--o3cw4h"
    )
    assert (  # צהל.ישראל military branch host
        dom("unit.xn--8dbq2a.xn--4dbrk0ce") == "unit.xn--8dbq2a.xn--4dbrk0ce"
    )
    assert (  # орг.срб organization
        dom("a.b.xn--c1avg.xn--90a3ac") == "b.xn--c1avg.xn--90a3ac"
    )
    assert (  # 公司.香港 company host
        dom("firm.xn--55qx5d.xn--j6w193g") == "firm.xn--55qx5d.xn--j6w193g"
    )
    assert (  # 网络.cn
        dom("x.y.xn--io0a7i.cn") == "y.xn--io0a7i.cn"
    )
    assert (  # 網路.tw
        dom("srv.xn--zf0ao64a.tw") == "srv.xn--zf0ao64a.tw"
    )


def _ref_psl_registrable(host: str, rules: list[str]) -> str:
    """Spec-literal reference (publicsuffix.org/list — the wiki
    algorithm), written independently of the engine's generated
    expressions: find all matching rules (* matches exactly one
    label), exceptions prevail, else most labels; registrable =
    suffix + 1 label; fall back to the whole host when undefined."""
    labels = host.split(".")

    def matches(rule: str) -> bool:
        r = rule.split(".")
        if len(r) > len(labels):
            return False
        return all(
            rl == "*" or rl == hl
            for rl, hl in zip(r, labels[len(labels) - len(r):])
        )

    exc = [r[1:] for r in rules if r.startswith("!") and matches(r[1:])]
    if exc:
        ps_len = len(exc[0].split(".")) - 1
    else:
        hit = [r for r in rules if not r.startswith("!") and matches(r)]
        ps_len = max((len(r.split(".")) for r in hit), default=1)
    if len(labels) <= ps_len:
        return host
    return ".".join(labels[len(labels) - ps_len - 1:])


def test_heuristic_fallback_when_psl_data_missing(spark, monkeypatch):
    """The documented no-data fallback: with the rule file absent
    (_PSL None), registrable_domain degrades to the two-level
    heuristic and its DuckDB replay regenerates in the heuristic
    form — the pair still agrees."""
    import duckdb as dd

    import coltt_spark.functions.urls as urls

    monkeypatch.setattr(urls, "_PSL", None)
    dom = urls.registrable_domain(F.col("h"))
    df = spark.createDataFrame(
        [("blog.example.co.uk",), ("a.example.com",), ("localhost",),
         ("shop.foo.co.nz",)],
        ["h"],
    )
    got = [r["d"] for r in df.select(dom.alias("d")).collect()]
    # co.nz is NOT in the fallback's table, so the heuristic gives
    # the WRONG eTLD+1 here — the documented wrongness the PSL path
    # fixes; the fallback contract is agreement, not correctness
    assert got == ["example.co.uk", "example.com", "localhost", "co.nz"]
    dd_expr = urls._dd_registrable_domain()
    con = dd.connect()
    for h, want in zip(
        ["blog.example.co.uk", "a.example.com", "localhost", "shop.foo.co.nz"],
        got,
    ):
        w = con.execute(
            f"SELECT {dd_expr.format(h='h')} FROM (SELECT ? AS h)", [h]
        ).fetchone()[0]
        assert w == want, h


def test_registrable_domain_matches_spec_reference():
    """Fuzz the generated DuckDB expression against the spec-literal
    Python algorithm over every shipped rule × host construction."""
    import duckdb as dd

    from coltt_spark.functions.urls import PSL_PATH

    rules = []
    with open(PSL_PATH) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("//"):
                rules.append(line)

    hosts = []
    for r in rules:
        base = r.lstrip("!").replace("*", "wild")
        hosts += [base, f"one.{base}", f"two.one.{base}"]
    hosts += ["localhost", "com", "a.b.c.d.e.example.com"]

    # ONE query over all ~9.8k hosts: executing the ~40 KB generated
    # CASE per host re-parsed/re-bound it ~9.8k times (measured 387 s
    # — the whole suite's slowest test by 13x); the set-based form
    # runs the identical expression on the identical hosts in ~2 s
    # (r14-opt, VERDICT r13 #1 — same coverage, same assertions)
    con = dd.connect()
    got_rows = con.execute(
        f"SELECT h, {DD_REGISTRABLE_DOMAIN.format(h='h')} "
        "FROM (SELECT unnest(?::VARCHAR[]) AS h) t",
        [hosts],
    ).fetchall()
    assert len(got_rows) == len(hosts)
    # a rule can only match a host whose LAST label equals the rule's
    # last label (every match is a ≥1-label suffix match), so bucket
    # the rules once — the reference algorithm is unchanged, it just
    # never scans rules that cannot match (9.8k hosts x 3.3k rules
    # was ~30 s of pure Python)
    by_last: dict = {}
    for r in rules:
        by_last.setdefault(r.lstrip("!").rsplit(".", 1)[-1], []).append(r)
    for (h, got), h2 in zip(got_rows, hosts):
        assert h == h2  # unnest preserves input order
        want = _ref_psl_registrable(h, by_last.get(h.rsplit(".", 1)[-1], []))
        assert got == want, f"{h}: generated={got} spec={want}"


def test_full_size_psl_drops_in(spark, tmp_path, monkeypatch):
    """The module's headline claim — the FULL upstream PSL (~10k
    rules) drops in with zero code changes: a synthetic full-shape
    rule file (thousands of 2/3-level plain rules, hundreds of
    wildcards, exceptions) must still parse, stay inside whole-stage
    codegen (isin compiles to an InSet hash lookup, not a comparison
    chain), agree with DuckDB, and keep the curated snapshot's
    semantics for the classic cases."""
    import hashlib

    import duckdb as dd

    import coltt_spark.functions.urls as urls

    rules = ["com", "uk", "co.uk", "ck", "*.ck", "!www.ck"]
    for i in range(2000):
        h = hashlib.md5(f"tld{i}".encode()).hexdigest()
        if i % 20 == 0:
            rules.append(f"*.{h[:6]}")
        elif i % 17 == 0:
            rules.append(f"{h[:4]}.{h[4:10]}.{h[10:12]}")
        else:
            rules.append(f"{h[:5]}.{h[5:11]}")
    p = tmp_path / "big_psl.dat"
    p.write_text("// synthetic full-size file\n" + "\n".join(rules) + "\n")
    monkeypatch.setattr(urls, "_PSL", urls.parse_psl(str(p)))

    h1 = hashlib.md5(b"tld3").hexdigest()
    cases = {
        "a.b.example.com": "example.com",
        "blog.x.co.uk": "x.co.uk",
        "bar.foo.ck": "bar.foo.ck",
        "sub.www.ck": "www.ck",
        f"keep.{h1[:5]}.{h1[5:11]}": f"keep.{h1[:5]}.{h1[5:11]}",
    }
    df = spark.createDataFrame([(x,) for x in cases], ["h"])
    out = df.select("h", urls.registrable_domain(F.col("h")).alias("d"))
    got = {r["h"]: r["d"] for r in out.collect()}
    assert got == cases
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lstrip().startswith("*")  # still whole-stage codegen
    dd_expr = urls._dd_registrable_domain()
    con = dd.connect()
    for h, want in cases.items():
        w = con.execute(
            f"SELECT {dd_expr.format(h='h')} FROM (SELECT ? AS h)", [h]
        ).fetchone()[0]
        assert w == want, h


def test_expanded_psl_suffixes_resolve(spark):
    """r8 snapshot expansion (221 → ~1.4k rules): hand-derived eTLD+1
    for suffix classes that exist ONLY in the expanded file — a .jp
    prefecture, the *.kawasaki.jp wildcard and its !city exception,
    the .us k12 grid, *.nom.br, *.sch.uk, a blogspot country variant,
    a 3-label private rule, and an AWS compute wildcard — asserted
    EXACTLY on both engines (values derived from the PSL algorithm by
    hand, not from the generators)."""
    import duckdb as dd

    cases = [
        ("www.pref.hokkaido.jp", "pref.hokkaido.jp"),
        ("foo.bar.kawasaki.jp", "foo.bar.kawasaki.jp"),   # *.kawasaki.jp
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),     # !city.kawasaki.jp
        ("school.k12.tx.us", "school.k12.tx.us"),
        ("jose.silva.nom.br", "jose.silva.nom.br"),       # *.nom.br
        ("www.stalbans.sch.uk", "www.stalbans.sch.uk"),   # *.sch.uk
        ("myblog.blogspot.de", "myblog.blogspot.de"),
        ("app.eu.pythonanywhere.com", "app.eu.pythonanywhere.com"),
        ("vm1.useast.compute.amazonaws.com", "vm1.useast.compute.amazonaws.com"),
        ("a.b.gangwon.kr", "b.gangwon.kr"),
        ("shop.example.waw.pl", "example.waw.pl"),
        ("seoul.kr", "seoul.kr"),  # host IS a public suffix: whole
        # -- r9 ccTLD long-tail tranche (VERDICT r8 #5): registries
        # covered only by the ~2.1k-rule snapshot
        ("www.shop.com.fj", "shop.com.fj"),        # Fiji functional 2LD
        ("news.gouv.ht", "news.gouv.ht"),          # Haiti gouv 2LD
        ("www.bank.com.mv", "bank.com.mv"),        # Maldives
        ("a.b.isla.pr", "b.isla.pr"),              # Puerto Rico
        ("x.y.k12.vi", "y.k12.vi"),                # US Virgin Islands
        ("portal.gob.do", "portal.gob.do"),        # Dominican Rep. gob
        ("a.ltd.co.im", "a.ltd.co.im"),            # 3-label plain rule
        ("site.example.er", "site.example.er"),    # *.er wildcard
        ("b.c.moe.kh", "c.moe.kh"),                # *.kh wildcard
        ("gov.mr", "gov.mr"),                      # host IS a public suffix
        ("ministry.gov.mr", "ministry.gov.mr"),    # Mauritania
        ("a.saotome.st", "a.saotome.st"),          # São Tomé
        # -- r10 tranche 4 (VERDICT r9 #5): registries covered only by
        # the 2574-rule snapshot
        ("www.comune.roma.it", "comune.roma.it"),  # .it province name
        ("a.b.mi.it", "b.mi.it"),                  # .it two-letter code
        ("www.ditta.lombardia.it", "ditta.lombardia.it"),  # .it region
        ("x.valle-d-aosta.it", "x.valle-d-aosta.it"),  # .it variant family
        ("firm.example.it", "example.it"),         # plain .it still eTLD+1
        ("shop.sklep.czest.pl", "sklep.czest.pl"), # Polish town registry
        ("urzad.powiat.pl", "urzad.powiat.pl"),    # Polish functional
        ("cabinet.avocat.fr", "cabinet.avocat.fr"),  # .fr professional
        ("uni.ac.ir", "uni.ac.ir"),                # Iran
        ("x.y.go.th", "y.go.th"),                  # Thailand
        ("firm.com.sa", "firm.com.sa"),            # Saudi Arabia
        ("a.gop.pk", "a.gop.pk"),                  # Pakistan provincial gov
        # -- r11 tranche 5 (VERDICT r10 #4): registries covered only by
        # the 2920-rule snapshot
        ("www.kirke.bergen.no", "kirke.bergen.no"),  # .no municipality
        ("a.b.nes.no", "b.nes.no"),                  # .no municipality
        ("skole.gs.oslo.no", "skole.gs.oslo.no"),    # gs county grid
        ("x.gs.mr.no", "x.gs.mr.no"),                # gs two-letter county
        ("www.telemark.no", "www.telemark.no"),      # .no county name
        ("firma.example.no", "example.no"),          # plain .no still eTLD+1
        ("cdn.a.ssl.fastly.net", "cdn.a.ssl.fastly.net"),  # fastly family
        ("shop.myshopify.com", "shop.myshopify.com"),      # site builder
        ("team.notion.site", "team.notion.site"),
        ("docs.gitbook.io", "docs.gitbook.io"),
        # -- r11 tranche 5c: the .jp municipal registry subset
        ("www.shibuya.tokyo.jp", "www.shibuya.tokyo.jp"),  # Tokyo ward
        ("a.b.kamakura.kanagawa.jp", "b.kamakura.kanagawa.jp"),
        ("site.pref.hokkaido.jp", "pref.hokkaido.jp"),  # pref rule intact
        ("x.tokyo.jp", "x.tokyo.jp"),  # non-municipal 3rd level = eTLD+1
        # -- r12 tranche 6: punycoded UTF-8 .no municipal/county names
        # (real crawled hosts arrive in punycode — xn--lesund-hua.no is
        # ålesund.no, xn--bod-2na.no is bodø.no; hand-derived eTLD+1)
        ("www.xn--lesund-hua.no", "www.xn--lesund-hua.no"),  # ålesund
        ("a.b.xn--bod-2na.no", "b.xn--bod-2na.no"),          # bodø
        ("x.xn--troms-zua.no", "x.xn--troms-zua.no"),        # tromsø
        ("skole.xn--brum-voa.no", "skole.xn--brum-voa.no"),  # bærum
        # the county itself stays a suffix: host+1 label registers
        ("nav.xn--stfold-9xa.no", "nav.xn--stfold-9xa.no"),  # østfold
        # county-qualified duplicated municipal name (3-label rule)
        ("a.xn--b-5ga.telemark.no", "a.xn--b-5ga.telemark.no"),  # bø
        ("x.os.hedmark.no", "x.os.hedmark.no"),
        # māori.nz — the UTF-8 twin of maori.nz
        ("iwi.xn--mori-qsa.nz", "iwi.xn--mori-qsa.nz"),
        ("site.sogn-og-fjordane.no", "site.sogn-og-fjordane.no"),
        ("a.b.kiwi.nz", "b.kiwi.nz"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r["d"]
        for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()
    ]
    con = dd.connect()
    for (host, want), g in zip(cases, got):
        assert g == want, f"spark: {host} -> {g}, want {want}"
        w = con.execute(
            f"SELECT {DD_REGISTRABLE_DOMAIN.format(h='h')} "
            f"FROM (SELECT ? AS h)", [host]
        ).fetchone()[0]
        assert w == want, f"duckdb: {host} -> {w}, want {want}"

def test_domain_quota_caps_at_tranche5_granularity(spark):
    """The VERDICT r10 #4 failure mode, pinned on the tranche-5
    registries: before the .no municipal rules shipped,
    ``registrable_domain`` returned ``bergen.no`` for every
    ``*.bergen.no`` host — so a per-domain quota would cap ALL of a
    municipality's distinct sites under ONE bucket. With the rules,
    each ``<site>.bergen.no`` is its own registrable domain and the
    cap applies per site; a gs-grid school host likewise caps under
    its own ``<school>.gs.oslo.no``."""
    from coltt_spark.operators.pipeline import domain_quota

    rows = []
    i = 0
    for site in ("kirke", "skole", "havn"):
        for k in range(4):  # 4 docs per site, cap=2 keeps 2 each
            rows.append((i, f"p{k}.{site}.bergen.no", float(10 - k)))
            i += 1
    for k in range(4):
        rows.append((i, f"c{k}.voss.gs.oslo.no", float(k)))
        i += 1
    df = spark.createDataFrame(rows, "doc_id long, host string, pri double")
    out = (
        domain_quota(
            df.withColumn("domain", registrable_domain(F.col("host"))),
            "doc_id", "domain", "pri", cap=2,
        )
        .groupBy("domain")
        .count()
        .collect()
    )
    got = {r["domain"]: r["count"] for r in out}
    assert got == {
        "kirke.bergen.no": 2,
        "skole.bergen.no": 2,
        "havn.bergen.no": 2,
        "voss.gs.oslo.no": 2,
    }, got
