from coltt_spark.plans.inspect import (
    executed_plan,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "has_take_ordered",
    "wholestage_codegen_spans",
]
