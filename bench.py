#!/usr/bin/env python
"""Benchmark harness: runs the headline registry queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Comparable reference datum (BASELINE.md): edge FLAT scan over 1M
128-dim vectors = 0.02-0.3 s/query; our KNN queries scan the
embeddings table with a TakeOrderedAndProject plan, which is the same
per-partition-topK-merge physical shape.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from coltt_spark import get_spark
    from coltt_spark.registry import QUERIES

    spark = get_spark(app_name="coltt_spark_bench")
    # warm the JVM / parquet footer caches so per-query numbers measure
    # the plan, not session startup or first-read footer parsing
    from coltt_spark.sources.tables import load_tables

    spark.range(1000).selectExpr("sum(id)").collect()
    for df in load_tables(spark, sf_dir).values():
        df.count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
