"""robots.txt parsing and URL filtering — the crawl-politeness gate
of a web-corpus pipeline.

Between URL normalization (:mod:`coltt_spark.functions.urls`) and
fetching/text-extraction, every C4/RefinedWeb-style pipeline drops
URLs a site's ``robots.txt`` disallows for its crawler. This module
implements the RFC 9309 core as PURE Catalyst expressions (split /
regexp / higher-order array folds — JVM-side, no Python in the hot
path), so the per-domain parse and the per-URL decision both stay
whole-stage-codegen and oracle-replayable.

Documented contract (the subset both engines replay exactly):

- **Line model**: ``#`` starts a comment (stripped to end of line);
  lines are trimmed; directives are matched case-insensitively
  (``User-agent`` ≡ ``user-agent``).
- **Group selection** (RFC 9309 §2.2.1): consecutive ``User-agent``
  lines form one group head; a group's rules run until the next
  ``User-agent`` line. If ANY group names our agent exactly
  (case-insensitive), the agent's rule set is the union of those
  groups; otherwise the union of ``*`` groups. Unknown directives
  (``Crawl-delay``, ``Sitemap``, …) are ignored and do NOT end the
  group; rules before any ``User-agent`` line are ignored.
- **Rules**: ``Allow:`` / ``Disallow:`` with a non-empty value; an
  empty value is no rule (``Disallow:`` alone means allow-all).
- **Matching** (RFC 9309 §2.2.2): a rule value matches as a path
  prefix; ``*`` matches any character run; a TERMINAL ``$`` anchors
  the end of the path (elsewhere ``$`` is literal). The most
  specific match wins, specificity = octet length of the rule value
  AS WRITTEN (including ``*``/``$``); on a length tie the least
  restrictive (Allow) wins. No matching rule → allowed.

Scale shape: parse ONCE PER DOMAIN (the robots side is tiny by
construction — one row per registrable domain), then broadcast the
parsed rule arrays into the URL table and fold per row — zero
shuffles end to end (tests/test_plans.py pins the plan).

Reference scope stops at opaque blobs (no web surface); this is
engine-side plumbing a crawl-scale training pipeline needs — same
posture as :mod:`coltt_spark.operators.html_text`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_decision", "robots_allowed"]


def _key(line: Column) -> Column:
    """Lower-cased directive name, '' for non-directive lines."""
    return F.lower(F.regexp_extract(line, r"^([A-Za-z][A-Za-z-]*)\s*:", 1))


def _value(line: Column) -> Column:
    """Trimmed directive value ('' when absent)."""
    return F.trim(F.regexp_extract(line, r"^[A-Za-z][A-Za-z-]*\s*:(.*)$", 1))


def _regexify(val: Column) -> Column:
    """Rule value → anchored Java/RE2-safe regex: literal chars
    escaped, ``*`` → ``.*``, terminal ``$`` → end anchor."""
    dollar = F.endswith(val, F.lit("$"))
    body = F.when(dollar, F.substr(val, F.lit(1), F.length(val) - 1)).otherwise(val)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    star = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), star, F.when(dollar, F.lit("$")).otherwise(F.lit(""))
    )


#: rule element type: (specificity, is-allow, anchored regex)
_RULES_T = "array<struct<rlen:int,allow:boolean,pattern:string>>"


def parse_robots(robots: Column, agent: str) -> Column:
    """Parse a robots.txt string into the rule array applicable to
    ``agent`` — ``array<struct<rlen,allow,pattern>>`` (see module
    contract). One Catalyst fold over the line array; meant to run on
    the tiny per-domain side and broadcast from there."""
    agent_l = agent.lower()
    lines = F.transform(
        F.split(robots, "\n"),
        lambda l: F.trim(F.regexp_replace(l, "#.*$", "")),
    )
    has_exact = F.exists(
        lines,
        lambda l: (_key(l) == "user-agent") & (F.lower(_value(l)) == agent_l),
    )
    target = F.when(has_exact, F.lit(agent_l)).otherwise(F.lit("*"))

    zero = F.struct(
        F.lit(False).alias("ua"),
        F.lit(False).alias("act"),
        F.expr(f"CAST(array() AS {_RULES_T})").alias("rules"),
    )

    def step(st: Column, l: Column) -> Column:
        key, val = _key(l), _value(l)
        is_ua = key == "user-agent"
        ua_match = F.lower(val) == target
        is_rule = key.isin("allow", "disallow") & (val != "")
        rules = F.when(
            is_rule & st["act"],
            F.array_append(
                st["rules"],
                F.struct(
                    F.length(val).alias("rlen"),
                    (key == "allow").alias("allow"),
                    _regexify(val).alias("pattern"),
                ),
            ),
        ).otherwise(st["rules"])
        act = (
            F.when(is_ua, F.when(st["ua"], st["act"] | ua_match).otherwise(ua_match))
            .otherwise(st["act"])
        )
        return F.struct(is_ua.alias("ua"), act.alias("act"), rules.alias("rules"))

    return F.aggregate(lines, zero, step, lambda st: st["rules"])


def robots_decision(path: Column, rules: Column) -> Column:
    """Fold the rule array against ``path`` → the winning rule as
    ``struct<rlen,allow>`` (``rlen = -1, allow = true`` when nothing
    matches). Longest match wins; Allow wins a length tie."""
    zero = F.struct(F.lit(-1).alias("rlen"), F.lit(True).alias("allow"))

    def step(acc: Column, r: Column) -> Column:
        better = (r["rlen"] > acc["rlen"]) | (
            (r["rlen"] == acc["rlen"]) & r["allow"] & ~acc["allow"]
        )
        take = F.rlike(path, r["pattern"]) & better
        return F.when(
            take, F.struct(r["rlen"].alias("rlen"), r["allow"].alias("allow"))
        ).otherwise(acc)

    return F.aggregate(rules, zero, step)


def robots_allowed(path: Column, rules: Column) -> Column:
    """True when ``rules`` (from :func:`parse_robots`) permit
    fetching ``path``."""
    return robots_decision(path, rules)["allow"]
