"""Distributed recommender training: rank-2 ALS with closed-form
solves and integer-exact cross-engine arithmetic.

Alternating least squares (Koren/Bell/Volinsky's matrix-factorization
family; Spark MLlib ships a black-box `ALS`) re-expressed
DataFrame-first with the repo's oracle discipline (the
kmeans/logreg/PCA pattern: FIXED unrolled iterations, integer
quantization at every accumulation boundary, FLOOR for every
division):

* Factors live as BIGINT micro-units (×10⁻⁶). All Gram/moment sums
  (Σq₁², Σq₁q₂, Σr·q) accumulate as decimal(38,0) — exact, order-
  independent, identical to DuckDB's HUGEINT sums, so the per-round
  model is bit-reproducible in SQL.
* Rank 2 makes the normal-equation solve CLOSED FORM: (A + λI)⁻¹d via
  the 2×2 adjugate — one expression, no iterative solver, which is
  what lets an engine-independent oracle replay training exactly.
* Each solve re-quantizes to the micro grid with FLOOR of the same
  double expression on both engines (double division is IEEE-identical
  given identical operand order; see table_checksum's convention).

Scale shape: the user-side solve joins ratings against the ITEM
factor table (broadcast — items ≤ catalog size) and aggregates per
user (one keyed shuffle); the item-side solve joins against the USER
factor table co-partitioned on the user key (one shuffle) and
aggregates per item (cells ≤ |items|, map-side combined). Per round:
2 keyed exchanges + 1 broadcast, model state never on the driver
except the |items|-row factor table a caller may collect. λ > 0 keeps
every determinant strictly positive — no singular solves, no division
guard needed.

Reference parity anchor: the reference has no ML surface at all; this
extends its star-schema aggregates (enrich.py) the way a training
pipeline would consume them.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yelp_etl_spark.functions.sampling import hash60

MICRO = 1_000_000
# λ = 0.1 in the Gram matrix's 10⁻¹² scale
LAM_SCALED = 100_000_000_000


def init_item_factors(items: DataFrame, item_col: str) -> DataFrame:
    """Deterministic, portable, symmetry-breaking init: q₁ = 1.0,
    q₂ = 0.1 + (hash60(item) mod 500000)/10⁶ — every engine derives
    the identical start point from the item ids alone."""
    return items.select(
        F.col(item_col).alias("item"),
        F.lit(MICRO).cast("long").alias("q1"),
        (F.lit(100_000) + hash60(F.col(item_col)) % F.lit(500_000))
        .cast("long")
        .alias("q2"),
    )


def _solve(joined: DataFrame, solve_key: str) -> DataFrame:
    """Closed-form regularized 2×2 normal-equation solve per key.

    ``joined`` columns: solve_key, r (BIGINT rating), q1/q2 (micro
    factors of the FIXED side). Returns (solve_key→"item"/"user",
    q1, q2) in micro units: p = 10¹²·(A+λI)⁻¹d computed via the
    adjugate, FLOOR-quantized."""
    # cast BEFORE multiplying: long×long would overflow (ANSI throw)
    # once factor magnitudes grow; decimal products are exact and
    # mirror the oracle's CAST(.. AS HUGEINT) * CAST(.. AS HUGEINT)
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = joined.groupBy(F.col(solve_key).alias("k")).agg(
        F.sum(d("q1") * d("q1")).alias("a"),
        F.sum(d("q1") * d("q2")).alias("b"),
        F.sum(d("q2") * d("q2")).alias("c"),
        F.sum(d("r") * d("q1")).alias("d1"),
        F.sum(d("r") * d("q2")).alias("d2"),
    )
    # Post-aggregation algebra in DOUBLE: the Gram products a·c, c·d1
    # overflow decimal(38,0) once |users|·|p|² passes ~10³⁸ (observed
    # at sf0.1). Each exact decimal aggregate casts to double ONCE
    # (round-to-nearest — identical in Spark and DuckDB), and every
    # subsequent (+,·,/,floor) is the same IEEE operation in the same
    # order on both engines, so cross-engine equality is preserved;
    # only unbounded-precision exactness is traded away.
    a = (F.col("a") + F.lit(LAM_SCALED)).cast("double")
    c = (F.col("c") + F.lit(LAM_SCALED)).cast("double")
    b = F.col("b").cast("double")
    d1 = F.col("d1").cast("double")
    d2 = F.col("d2").cast("double")
    det = a * c - b * b
    n1 = c * d1 - b * d2
    n2 = a * d2 - b * d1
    scale = F.lit(1e12)
    return agg.select(
        "k",
        F.floor(scale * n1 / det).cast("long").alias("q1"),
        F.floor(scale * n2 / det).cast("long").alias("q2"),
    )


def als_rank2(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    iterations: int = 2,
) -> DataFrame:
    """Train rank-2 ALS for a FIXED number of alternating rounds and
    return the final ITEM factor table (item, q1, q2) in micro units —
    the |items|-row model a serving layer would broadcast.

    ``rating_col`` must be integral (cast upstream): integer ratings
    keep every moment sum exact. Each round: user solve (item factors
    broadcast), then item solve (ratings ⋈ user factors co-partitioned
    on the user key). User factors never materialize driver-side."""
    r = ratings.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col(rating_col).cast("long").alias("r"),
    )
    q = init_item_factors(r.select("item").distinct(), "item")
    for _ in range(iterations):
        p = _solve(
            r.join(F.broadcast(q), "item"), "user"
        ).withColumnRenamed("k", "user")
        q = _solve(r.join(p, "user"), "item").withColumnRenamed("k", "item")
    return q
