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


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass column profiler — the discovery step before writing
    quality rules: per column, non-null/null counts, distinct
    cardinality, and the Shannon entropy of the value distribution in
    integer micro-nats (high entropy ≈ key-like, near-zero ≈
    constant; the metadata a 100 TB curation pipeline wants BEFORE
    choosing partition keys, dedup keys, or stratification columns).

    All columns profile in ONE scan: an unpivot (``stack``) streams
    (column, value) pairs into a single keyed aggregation — k columns
    never cost k scans. Values are compared as strings purely for the
    uniform unpivot schema; counts are unaffected for the
    integer/string columns this targets. Entropy follows the repo's
    micro-nat discipline in the DECOMPOSED form
    ``q(ln n) − round(Σ cnt·q(ln cnt) / n)`` with ``q(x) =
    round(1e6·x)``: the per-cell term needs only its own count, so
    counts, distincts, and the entropy sum all come out of a single
    aggregation over the cell frame — one scan, one shuffle, nothing
    cached or pinned (the previous shape consumed the cell frame twice
    through a session-lifetime ``.cache()`` — r6 ADVICE).

    Returns (col_name, n_nonnull, n_null, n_distinct,
    entropy_micronats) ordered by col_name."""
    stack_expr = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in columns
    )
    pairs = df.select(
        F.expr(f"stack({len(columns)}, {stack_expr}) as (col_name, value)")
    )
    cells = pairs.groupBy("col_name", "value").agg(
        F.count("*").alias("cnt")
    )
    notnull = F.col("value").isNotNull()
    # q(ln cnt) per cell — integer micro-nats BEFORE the sum, so the
    # Σ is exact BIGINT under any partitioning / merge order
    qc = F.round(F.log(F.col("cnt").cast("double")) * F.lit(1_000_000.0)).cast(
        "long"
    )
    per_col = cells.groupBy("col_name").agg(
        F.sum(F.when(notnull, F.col("cnt")).otherwise(0)).alias("n_nonnull"),
        F.sum(F.when(~notnull, F.col("cnt")).otherwise(0)).alias("n_null"),
        F.count(F.when(notnull, F.lit(1))).alias("n_distinct"),
        F.sum(F.when(notnull, F.col("cnt") * qc).otherwise(0)).alias("sum_cq"),
    )
    qn = F.round(
        F.log(F.col("n_nonnull").cast("double")) * F.lit(1_000_000.0)
    ).cast("long")
    return per_col.select(
        "col_name",
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        # an all-null column has no non-null cells: report entropy 0
        # over the empty distribution (it is the single most
        # pathological column a discovery pass can find)
        F.when(F.col("n_nonnull") > 0, qn - F.round(
            F.col("sum_cq") / F.col("n_nonnull")
        ).cast("long")).otherwise(F.lit(0)).cast("long")
        .alias("entropy_micronats"),
    ).orderBy("col_name")
