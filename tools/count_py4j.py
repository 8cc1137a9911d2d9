"""Per-key py4j round-trip counter for registry query CONSTRUCTION.

The r13-opt round found that building a DataFrame costs one py4j
gateway round-trip per Column/functions call (~0.05-0.5 ms each under
host load), so literal-heavy constructors cost real driver seconds
before Spark ever runs. This tool measures that cost per registry key
by monkeypatching the single choke point every gateway message goes
through (``ClientServerConnection.send_command``) and constructing
each key's DataFrame twice: the FIRST pass warms fixture caches
(index builds, trained models — those run jobs and inflate counts),
the SECOND pass is the steady-state construction the bench and driver
pay per run, which is what gets recorded.

Usage: python tools/count_py4j.py [out.json] [sf_dir]

Output: {"key": {"calls": N, "sec": wall}} sorted by calls desc, plus
a "_total" entry. Counts are steal-independent (they count messages,
not time); `sec` wanders with host load and is advisory.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/py4j_counts.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from py4j.clientserver import ClientServerConnection

    state = {"n": 0}
    orig = ClientServerConnection.send_command

    def patched(self, *a, **k):
        state["n"] += 1
        return orig(self, *a, **k)

    ClientServerConnection.send_command = patched

    from coltt_spark import get_spark
    from coltt_spark.registry import QUERIES

    spark = get_spark(app_name="py4j_count", cpus=8, shuffle_partitions=8)

    # pass 1: warm every fixture/module cache (counts discarded)
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir)
        except Exception as exc:  # fault-isolated: record and move on
            print(f"warm {name}: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        before = state["n"]
        t0 = time.time()
        try:
            fn(spark, sf_dir)
        except Exception as exc:
            results[name] = {"calls": -1, "sec": 0.0, "err": str(exc)[:200]}
            continue
        results[name] = {
            "calls": state["n"] - before,
            "sec": round(time.time() - t0, 4),
        }
    results = dict(
        sorted(results.items(), key=lambda kv: -kv[1]["calls"])
    )
    results["_total"] = {
        "calls": sum(v["calls"] for v in results.values() if v["calls"] > 0),
        "sec": round(sum(v["sec"] for v in results.values()), 2),
    }
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    for name, v in list(results.items())[:25]:
        print(name, v)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
