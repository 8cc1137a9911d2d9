"""Physical-plan inspection: the scale contract, made testable.

Correct results are necessary but not sufficient — at 100 TB the plan
shape IS the product. These helpers read the executed plan so tests
can pin the properties that keep the engine fast at scale:

- filters pushed into the Parquet scan (``PushedFilters``) — the
  predicate does the work the reference's roaring-bitmap index did;
- KNN compiling to ``TakeOrderedAndProject`` — per-partition top-K +
  driver merge, never a global sort;
- dimension joins staying broadcast (no shuffle of the fact table);
- expressions running inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one predicate reached the Parquet scan."""
    plan = executed_plan(df)
    for line in plan.splitlines():
        if "PushedFilters: [" in line and "PushedFilters: []" not in line:
            return True
    return False


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_shuffle(df: DataFrame) -> bool:
    return "Exchange" in executed_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (the ``*(n)``
    prefixes in the executed-plan string)."""
    import re

    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    if ids:
        return len(ids)
    return plan.count("WholeStageCodegen")
