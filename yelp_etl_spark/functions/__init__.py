from yelp_etl_spark.functions import (
    checkpoint,
    curation,
    dedup,
    graph,
    multimodal,
    sampling,
    similarity,
    sketches,
    text,
    udfs,
)

__all__ = [
    "checkpoint",
    "curation",
    "dedup",
    "graph",
    "multimodal",
    "sampling",
    "similarity",
    "sketches",
    "text",
    "udfs",
]
