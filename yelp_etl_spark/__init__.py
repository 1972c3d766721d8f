"""yelp_etl_spark — a PySpark-native analytics/ETL engine.

A clean-room, Spark-first re-derivation of the capabilities of the
reference repo daniel-cortez-stevenson/yelp-etl (medallion-architecture
batch ETL: extract → clean → enrich), generalized into a library of pure
``DataFrame -> DataFrame`` operators plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md §7):
- Everything declarative DataFrame API — Catalyst plans the physical
  execution (pushdown, pruning, join selection, AQE).
- No row-at-a-time Python UDFs on hot paths; Pandas UDFs / mapInPandas
  only where built-ins can't express the semantics.
- Operators are pure functions, composable into pipelines; write-side
  layout (partition/bucket) is an explicit spec, not scattered config.
"""

__version__ = "0.1.0"
