from coltt_spark.operators.search import (
    compare_dist,
    filter_search,
    filterable_vertex_search,
    multi_vector_search,
    vertex_search,
)

__all__ = [
    "compare_dist",
    "filter_search",
    "filterable_vertex_search",
    "multi_vector_search",
    "vertex_search",
]
