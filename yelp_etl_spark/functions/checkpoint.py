"""Lineage truncation for iterative DataFrame algorithms.

Every loop in this package (pagerank / BFS in functions/graph.py,
label-propagation connected components in functions/dedup.py) carries a
DataFrame across iterations. Without truncation the plan doubles each
round (analysis cost grows, and a lost partition recomputes the whole
chain). Two ways to cut it:

- ``DataFrame.localCheckpoint``: materializes blocks on the executors.
  Free of any FS round-trip, but the blocks are NOT fault-tolerant —
  on a multi-executor cluster, losing one executor past iteration 1
  kills the job because the checkpointed partitions are gone.
- ``DataFrame.checkpoint``: writes to the SparkContext checkpoint
  directory (HDFS / object storage on a real cluster) — survives
  executor loss, costs one write+read of the (small, per-iteration)
  loop-carried table.

``truncate_lineage`` picks reliable checkpointing whenever a
checkpoint dir is configured and falls back to localCheckpoint
otherwise (local[N]: a single JVM, where executor loss is app loss
anyway, so durability buys nothing and the FS round-trip is pure
overhead). Cluster deployments should call ``set_checkpoint_dir``
(or ``sc.setCheckpointDir``) once at startup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def set_checkpoint_dir(spark: SparkSession, path: str) -> None:
    """Configure reliable checkpointing (point at durable shared
    storage — s3://... / hdfs://... — on a real cluster).

    Storage note: each ``truncate_lineage`` call writes one checkpoint
    directory under ``path`` and Spark only deletes them when
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is true (set by
    session.get_spark; default false upstream). Deployments building
    their own session must either set that conf or garbage-collect
    ``path`` externally — at 100 TB the per-iteration loop tables are
    small but the count is unbounded over a long-lived session.
    """
    spark.sparkContext.setCheckpointDir(path)


def checkpoint_dir(spark: SparkSession) -> str | None:
    return spark.sparkContext.getCheckpointDir()


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut the plan/lineage of a loop-carried DataFrame.

    Reliable ``checkpoint`` when the session has a checkpoint dir
    (executor-loss-safe — required at 100 TB); ``localCheckpoint``
    otherwise. Note reliable checkpoint is always materialized on
    write; ``eager=False`` only defers the local variant.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
