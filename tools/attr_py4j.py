"""Attribute py4j round-trips for ONE registry key to call sites.

Usage: python tools/attr_py4j.py <key> [sf_dir]

Monkeypatches ClientServerConnection.send_command and buckets each
round-trip by the innermost repo frame (file:line) on the stack.
Constructs the key twice (pass 1 warms fixture caches); pass-2 counts
are printed grouped by site, heaviest first.
"""

from __future__ import annotations

import sys
import traceback
from collections import Counter

sys.path.insert(0, "/root/repo")


def main() -> None:
    keys = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from py4j.clientserver import ClientServerConnection

    sites: Counter = Counter()
    state = {"on": False}
    orig = ClientServerConnection.send_command

    def patched(self, *a, **k):
        if state["on"]:
            st = traceback.extract_stack()
            site = "?"
            for fr in reversed(st):
                if "/root/repo/coltt_spark/" in fr.filename or fr.filename.endswith(
                    "registry_pipeline.py"
                ):
                    site = f"{fr.filename.split('/root/repo/')[-1]}:{fr.lineno}"
                    break
            sites[site] += 1
        return orig(self, *a, **k)

    ClientServerConnection.send_command = patched

    from coltt_spark import get_spark
    from coltt_spark.registry import QUERIES

    spark = get_spark(app_name="py4j_attr", cpus=8, shuffle_partitions=8)
    for key in keys:
        sites.clear()
        QUERIES[key](spark, sf_dir)  # warm
        state["on"] = True
        QUERIES[key](spark, sf_dir)
        state["on"] = False

        total = sum(sites.values())
        print(f"== {key}: {total} calls")
        for site, n in sites.most_common(15):
            print(f"{n:6d}  {site}")


if __name__ == "__main__":
    main()
