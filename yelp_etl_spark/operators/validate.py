"""Data-quality validation: declarative rule checks in one pass.

ETL engines need a quality gate between layers (the reference's
bronze→silver boundary, clean.py) — but the reference validates only by
eyeballing printSchema/show (extract.py:32-33). Here rules are declared
as Boolean violation predicates and evaluated in a SINGLE aggregate
pass with count_if, so a 100 TB table pays one scan for any number of
rules. Key-uniqueness is the one rule that genuinely needs a shuffle
(group on the key); it's a separate function so scans stay single-pass
when uniqueness isn't requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row report: total row count plus one violation count per
    rule. ``rules`` maps rule name → Boolean Column that is True where
    the row VIOLATES the rule. All counts come from one aggregate —
    one scan regardless of rule count."""
    aggs = [F.count("*").alias("n_rows")] + [
        F.count_if(pred).alias(name) for name, pred in rules.items()
    ]
    return df.agg(*aggs)


def duplicate_key_count(df: DataFrame, keys: list[str]) -> DataFrame:
    """One-row count of rows participating in a duplicated key. The
    groupBy shuffles only the key columns (project first), with
    map-side partial counts."""
    per_key = df.select(keys).groupBy(keys).agg(F.count("*").alias("__n"))
    return per_key.agg(
        F.coalesce(
            F.sum(F.when(F.col("__n") > 1, F.col("__n"))), F.lit(0)
        )
        .cast("long")
        .alias("n_rows_with_dup_key")
    )


def assert_quality(df: DataFrame, rules: dict[str, Column]) -> None:
    """Raise ValueError listing violated rules (for pipeline gates)."""
    row = quality_report(df, rules).collect()[0]
    bad = {name: row[name] for name in rules if row[name] > 0}
    if bad:
        raise ValueError(f"data-quality violations: {bad}")
