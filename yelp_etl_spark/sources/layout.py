"""Data-layout operators: z-order clustering and per-file zone maps.

The reference's layout surface is identity partitions + hash buckets
(write.py:45-53 — SURVEY.md §2.1 S5/S6). Hash buckets co-locate joins
but deliberately *scatter* value ranges, so range predicates still read
every file. Z-order clustering is the complementary layout: interleave
the bits of several normalized key columns and range-partition + sort
by that key, so each output file covers a small hyper-rectangle of the
key space and a predicate on ANY of the clustered columns prunes most
files via parquet min/max (zone-map) statistics. This is what
Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it is plain DataFrame
code: normalize → interleave (bitwise expressions, whole-stage codegen)
→ repartitionByRange → sortWithinPartitions → write.

At 100 TB the win is at the scan: a 1%-selective range predicate on a
z-ordered table reads ~1% of files instead of 100% — no engine change
needed, parquet footer stats do the pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-normalize a numeric column to a [0, 2^bits) integer."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (col.cast("double") - lo) / span
    max_code = (1 << bits) - 1
    code = F.floor(frac * max_code)
    return F.greatest(F.lit(0), F.least(F.lit(max_code), code)).cast("long")


def _interleave(codes: list[Column], bits: int) -> Column:
    """Bit-interleave N equal-width codes into one z-value (Morton
    order). Pure bitwise shifts/ors — stays in codegen."""
    n = len(codes)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(code, b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - i),
                )
            )
    return z


def zorder_key(
    df: DataFrame, columns: list[str], bits: int = 16
) -> DataFrame:
    """Append a ``__z`` Morton key over ``columns``. Column bounds come
    from one aggregate broadcast back onto the rows (no collect): the
    normalization stays fully distributed and the key is deterministic
    for a given dataset."""
    bounds = df.agg(
        *[
            f
            for c in columns
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    codes = [
        _scale_to_bits(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in columns
    ]
    return with_bounds.withColumn("__z", _interleave(codes, bits)).drop(
        *[f"__lo_{c}" for c in columns], *[f"__hi_{c}" for c in columns]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    columns: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``columns``:
    range-partition on the z-key (each file owns a contiguous z-range =
    a small hyper-rectangle of the key space) and sort within files so
    parquet row-group stats are tight too. One extra shuffle at write
    time buys min/max pruning on every clustered column at read time."""
    keyed = zorder_key(df, columns, bits)
    (
        keyed.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Per-file zone map: (file, count, min/max of each column) — the
    same statistics parquet footers carry, surfaced as a DataFrame for
    layout audits and skipping estimates. One scan, one tiny aggregate
    keyed by input_file_name."""
    df = spark.read.parquet(path)
    return df.groupBy(F.input_file_name().alias("file")).agg(
        F.count("*").alias("n_rows"),
        *[
            f
            for c in columns
            for f in (
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            )
        ],
    )


def files_matching_point(stats: DataFrame, column: str, value) -> int:
    """How many files could contain ``column = value`` per the zone
    map — the read amplification of a point probe under this layout."""
    return stats.filter(
        (F.col(f"min_{column}") <= value) & (F.col(f"max_{column}") >= value)
    ).count()
