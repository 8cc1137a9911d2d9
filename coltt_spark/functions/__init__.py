from coltt_spark.functions.vector import (
    cosine_distance,
    dot,
    euclidean_distance,
    l2_norm,
    l2_normalize,
    manhattan_distance,
    score,
    vector_distance,
)

__all__ = [
    "cosine_distance",
    "dot",
    "euclidean_distance",
    "l2_norm",
    "l2_normalize",
    "manhattan_distance",
    "score",
    "vector_distance",
]
