"""Deterministic hash-based sampling and train/test split assignment.

Training-data pipelines need samples and splits that are (a)
reproducible across runs and engines, (b) stable under repartitioning,
and (c) computable without a shuffle. Seeded ``df.sample`` is none of
these: Spark's sampler draws per-partition, so the kept set changes
whenever partitioning changes. Here every decision is a pure function
of a stable business key: the first H lowercase-hex digits of
``md5(key)`` are a uniform integer in ``[0, 16^H)``, so a fraction
``f`` keeps exactly the keys whose prefix is ``< f * 16^H``.
Fixed-width lowercase hex compares byte-wise like the integer it
encodes, which keeps the predicate portable to any SQL engine — the
DuckDB oracle for the ``hash_split_sample`` query runs the identical
expression.

Scale: map-only. The predicate evaluates at the scan (no shuffle, no
state), and at 100 TB a 1% sample is a scan-level filter that AQE can
combine with partition pruning. Assignments never drift as the table
grows — a key's split is a property of the key, not of the snapshot.

The reference has no sampling surface (SURVEY.md §2.10); this is
extension surface for the LLM-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 4  # 65536 buckets -> fraction granularity 1/65536


def hash_prefix(key: Column, digits: int = HEX_DIGITS) -> Column:
    """First ``digits`` lowercase-hex chars of md5 of the key's string form."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, digits)


def fraction_threshold(fraction: float, digits: int = HEX_DIGITS) -> str:
    """Hex-prefix cutoff below which a key falls inside ``fraction``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = 16**digits
    cut = int(round(fraction * n))
    if cut >= n:
        # 'g' sorts after every hex digit, so every prefix passes.
        return "g" * digits
    return format(cut, f"0{digits}x")


def in_fraction(key: Column, fraction: float, digits: int = HEX_DIGITS) -> Column:
    """Boolean: key hashes into the leading ``fraction`` of hash space."""
    return hash_prefix(key, digits) < F.lit(fraction_threshold(fraction, digits))


def deterministic_sample(
    df: DataFrame, key_column: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per key, stable across runs,
    engines, and repartitioning. Duplicate keys are kept or dropped
    together (sampling is by entity, not by row)."""
    return df.filter(in_fraction(F.col(key_column), fraction))


def split_assignment(
    key: Column, train_fraction: float = 0.8, labels: tuple[str, str] = ("train", "test")
) -> Column:
    """'train' / 'test' label as a pure function of the key."""
    return F.when(in_fraction(key, train_fraction), F.lit(labels[0])).otherwise(
        F.lit(labels[1])
    )


def train_test_split(
    df: DataFrame,
    key_column: str,
    train_fraction: float = 0.8,
    split_column: str = "split",
) -> DataFrame:
    """Add a deterministic split column; partitions the table into
    disjoint, exhaustive train/test sets keyed on ``key_column``."""
    return df.withColumn(
        split_column, split_assignment(F.col(key_column), train_fraction)
    )


def stratified_sample(
    df: DataFrame,
    key_column: str,
    strata_column: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction of keys (e.g. downweight boilerplate sources, keep all of
    a rare class). Same md5-prefix mechanics as deterministic_sample —
    map-only, repartition-stable, engine-portable — with the threshold
    chosen per stratum by a CASE expression, so one scan handles any
    number of strata."""
    expr: Column = F.lit(fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_column) == value, F.lit(fraction_threshold(frac))
        ).otherwise(expr)
    return df.filter(hash_prefix(F.col(key_column)) < expr)


def balanced_downsample(
    df: DataFrame,
    key_column: str,
    group_column: str,
    per_group: int,
) -> DataFrame:
    """Class balancing: keep at most ``per_group`` rows per group,
    chosen deterministically (ranked by md5 of the key — an unbiased,
    reproducible shuffle order; ties impossible for unique keys). One
    shuffle on the group key; the ranking window does per-partition
    top-k, so memory is bounded by per_group, not group size."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_column).orderBy(
        hash_prefix(F.col(key_column), 8), F.col(key_column)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_group)
        .drop("__rn")
    )


def exp_priority(key: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis priority for weighted sampling without
    replacement: ``-ln(u) / w`` with u ∈ (0,1] drawn deterministically
    from a portable 60-bit md5 hash of the key (identical in Spark and
    DuckDB: ``conv(substr(md5, 18, 15), 16, 10)`` vs
    ``CAST(concat('0x', substr(md5, 18, 15)) AS BIGINT)``). The k rows
    with the SMALLEST priority form an exact weight-proportional
    without-replacement sample — and because the priority is a pure
    per-row function, selection is a global top-k
    (TakeOrderedAndProject), not a stateful reservoir pass."""
    h = F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 18, 15), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(1 << 60))
    return -F.log(u) / weight


def weighted_sample(
    df: DataFrame,
    key_column: str,
    weight_column: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows (weights > 0,
    inclusion probability ∝ weight, without replacement). Stable
    across runs, engines, and partitionings; rows with non-positive
    weight are excluded. Scale path: per-partition top-k then driver
    merge — Spark's TakeOrderedAndProject — so no global sort."""
    # round the priority so a last-ulp ln() difference between engines
    # (or JVM versions) cannot flip the k-th boundary; rounding-created
    # ties resolve deterministically by key
    pri = F.round(exp_priority(F.col(key_column), F.col(weight_column)), 6)
    return (
        df.filter(F.col(weight_column) > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(key_column).asc())
        .limit(k)
        .drop("__pri")
    )


def hash60(key: Column) -> Column:
    """Portable 60-bit integer hash of the key's string form — the
    Spark half of the convention documented at exp_priority (DuckDB
    twin: ``CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 18, 15))
    AS BIGINT)``). One definition so every bucket/sign/priority
    derivation stays in sync with its oracle."""
    return F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 18, 15), 16, 10
    ).cast("long")
