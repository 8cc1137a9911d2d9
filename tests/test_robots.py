"""robots.txt operator (operators/robots.py): directive parsing,
group selection, and the longest-match/Allow-tie decision — checked
against handwritten edge cases AND an independent spec-literal Python
reimplementation (written from the module contract, sharing no code)
over md5-randomized robots files × paths, the same independent-oracle
discipline the PNG unfilter tests use."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from coltt_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    robots_decision,
)


# -- independent reference implementation (spec-literal, no shared code) ----

def _ref_rules(robots: str, agent: str) -> list[tuple[int, bool, str]]:
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    in_ua_run = False
    for raw in robots.split("\n"):
        line = raw.split("#", 1)[0].strip()
        m = re.match(r"^([A-Za-z][A-Za-z-]*)\s*:(.*)$", line)
        if not m:
            in_ua_run = False
            continue
        key, val = m.group(1).lower(), m.group(2).strip()
        if key == "user-agent":
            if not in_ua_run:
                cur_agents = []
                groups.append((cur_agents, []))
            cur_agents.append(val.lower())
            in_ua_run = True
        else:
            in_ua_run = False
            if key in ("allow", "disallow") and val:
                if groups:
                    groups[-1][1].append((key, val))
    has_exact = any(agent in agents for agents, _ in groups)
    want = agent if has_exact else "*"
    rules = []
    for agents, rs in groups:
        if want in agents:
            for key, val in rs:
                rules.append((len(val), key == "allow", val))
    return rules


def _ref_match(path: str, rule_val: str) -> bool:
    dollar = rule_val.endswith("$")
    body = rule_val[:-1] if dollar else rule_val
    pat = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.match(pat + ("$" if dollar else ""), path) is not None


def _ref_decide(path: str, rules: list[tuple[int, bool, str]]) -> tuple[bool, int]:
    best = (True, -1)
    for rlen, allow, val in rules:
        if _ref_match(path, val) and (
            rlen > best[1] or (rlen == best[1] and allow and not best[0])
        ):
            best = (allow, rlen)
    return best


def _spark_decide(spark, robots: str, agent: str, paths: list[str]):
    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    rules = parse_robots(F.lit(robots), agent)
    dec = robots_decision(F.col("path"), rules)
    out = df.select(
        "path", dec["allow"].alias("allow"), dec["rlen"].alias("rlen")
    ).collect()
    return {r.path: (r.allow, r.rlen) for r in out}


EDGE_ROBOTS = """# politeness file
User-agent: otherbot
Disallow: /
Allow: /shared

Sitemap: https://example.com/sitemap.xml
User-agent: ColttBot
User-agent: thirdbot
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 10
Disallow: /admin
Disallow: /exact$
Disallow: /glob/*.json
Allow:
Disallow:

User-agent: colttbot
Disallow: /second-group
"""


def test_edge_cases_match_reference(spark):
    """Handwritten file covering: comments, decoy group, unknown
    directives mid-group, consecutive UA lines, case-insensitive
    agent match, $ anchor, * glob, empty-value rules, and a SECOND
    group for the same agent (union semantics)."""
    paths = [
        "/", "/shared", "/private/x", "/private/ok/x", "/admin",
        "/adminX", "/exact", "/exactly", "/glob/a.json", "/glob/a.html",
        "/second-group/page", "/unmatched",
    ]
    got = _spark_decide(spark, EDGE_ROBOTS, "colttbot", paths)
    rules = _ref_rules(EDGE_ROBOTS, "colttbot")
    for p in paths:
        assert got[p] == _ref_decide(p, rules), p
    # spot-pin the decisions themselves, not just cross-impl parity
    assert got["/"] == (True, -1)            # decoy Disallow:/ ignored
    assert got["/private/ok/x"][0] is True   # longest-match Allow wins
    assert got["/exact"] == (False, 7)       # $ anchors (rlen counts the $)
    assert got["/exactly"] == (True, -1)
    assert got["/glob/a.json"][0] is False   # * glob
    assert got["/glob/a.html"][0] is True
    assert got["/second-group/page"][0] is False  # union of both groups


def test_star_group_fallback(spark):
    robots = "User-agent: *\nDisallow: /a\n\nUser-agent: megabot\nAllow: /a\n"
    got = _spark_decide(spark, robots, "colttbot", ["/a/x", "/b"])
    assert got["/a/x"] == (False, 2)
    assert got["/b"] == (True, -1)


def test_no_groups_means_all_allowed(spark):
    got = _spark_decide(spark, "Disallow: /a  # no UA line\n", "colttbot", ["/a"])
    assert got["/a"] == (True, -1)


def test_allow_wins_length_tie(spark):
    robots = "User-agent: *\nDisallow: /abc\nAllow: /ab*\n"
    got = _spark_decide(spark, robots, "colttbot", ["/abcd"])
    assert got["/abcd"] == (True, 4)


def test_fuzz_against_reference(spark):
    """Deterministic md5-driven fuzz: random rule paths (with * and $
    sprinkled), random group layouts (exact-name vs star vs decoy),
    random request paths — every decision must equal the independent
    reimplementation's."""
    segs = ["a", "bb", "ccc", "d1", "e-e", "f.f"]

    def h(*parts: object) -> int:
        raw = ":".join(str(p) for p in parts).encode()
        return int(hashlib.md5(raw).hexdigest()[:8], 16)

    cases = []
    for i in range(40):
        lines = []
        n_groups = 1 + h(i, "g") % 3
        for g in range(n_groups):
            ua = ["colttbot", "*", "otherbot"][h(i, g, "ua") % 3]
            lines.append(f"User-agent: {ua}")
            for r in range(1 + h(i, g, "n") % 4):
                p = "/" + "/".join(
                    segs[h(i, g, r, j) % len(segs)]
                    for j in range(1 + h(i, g, r, "d") % 3)
                )
                if h(i, g, r, "star") % 4 == 0:
                    p += "*." + segs[h(i, g, r, "ext") % len(segs)]
                if h(i, g, r, "dollar") % 5 == 0:
                    p += "$"
                kind = "Allow" if h(i, g, r, "k") % 3 == 0 else "Disallow"
                lines.append(f"{kind}: {p}")
        robots = "\n".join(lines) + "\n"
        paths = []
        for q in range(6):
            paths.append(
                "/" + "/".join(
                    segs[h(i, q, "p", j) % len(segs)]
                    for j in range(1 + h(i, q, "pd") % 3)
                )
            )
        cases.append((robots, sorted(set(paths))))

    # one Spark job for the whole corpus: (case_id, robots, path) rows
    rows = [
        (ci, robots, p) for ci, (robots, paths) in enumerate(cases) for p in paths
    ]
    df = spark.createDataFrame(rows, ["case_id", "robots", "path"])
    dec = robots_decision(
        F.col("path"), parse_robots(F.col("robots"), "colttbot")
    )
    got = {
        (r.case_id, r.path): (r.allow, r.rlen)
        for r in df.select(
            "case_id", "path", dec["allow"].alias("allow"), dec["rlen"].alias("rlen")
        ).collect()
    }
    n_blocked = 0
    for ci, (robots, paths) in enumerate(cases):
        rules = _ref_rules(robots, "colttbot")
        for p in paths:
            want = _ref_decide(p, rules)
            assert got[(ci, p)] == want, (ci, p, robots)
            n_blocked += 0 if want[0] else 1
    assert n_blocked > 10  # the fuzz actually exercises denials


def test_robots_allowed_column(spark):
    robots = "User-agent: *\nDisallow: /x\n"
    df = spark.createDataFrame([("/x/1",), ("/y",)], ["path"])
    out = df.select(
        "path",
        robots_allowed(F.col("path"), parse_robots(F.lit(robots), "bot")).alias("a"),
    ).collect()
    assert {r.path: r.a for r in out} == {"/x/1": False, "/y": True}
