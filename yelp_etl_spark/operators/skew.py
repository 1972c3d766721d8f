"""Skew mitigation: salted joins and two-stage aggregation.

At 100 TB a handful of hot keys (one viral business, one boilerplate
shingle) can pin a join or aggregation on a single task. Two standard
remedies, expressed declaratively so Catalyst still plans everything:

- ``salted_join``: fact rows get a deterministic salt in [0, n); the
  small side is replicated n ways; the join key becomes (key, salt), so
  a hot key's rows spread across n tasks. Use when AQE's skew-join
  splitting (enabled in session.py) isn't enough — e.g. a single key
  larger than any split threshold.
- ``two_stage_agg``: partial aggregate on (key, salt), then final
  aggregate on key. For algebraic aggregates Catalyst's own
  partial+final already does this; the explicit variant matters for
  aggregates that are NOT map-side combinable (collect_list-style) or
  when one key dominates a reduce task.

Salts derive from xxhash64 over the row's own columns — deterministic
across runs and partitionings (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_expr(df: DataFrame, n_salts: int, salt_on: list[str] | None) -> Column:
    cols = salt_on or df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Join ``big`` (skewed) to ``small`` on column ``on``, spreading
    each key across ``n_salts`` partitions. ``small`` is replicated
    n_salts× — keep it genuinely small or the replication dominates."""
    salted_big = big.withColumn("__salt", _salt_expr(big, n_salts, salt_on))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


# (partial aggregate fn, merge aggregate fn) per supported spec.
# collect_list is the motivating NON-decomposable case: Catalyst cannot
# map-side-combine it, so one hot key funnels every row into a single
# reduce task; the salted pre-stage caps any task at ~rows/n_salts list
# elements, and the merge flattens the partial lists. The final
# array_sort makes the result order-deterministic (partial arrival
# order is not), so the two-stage output is comparable to a plain
# sorted collect_list.
_AGG_STAGES = {
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
    "collect_list": (
        lambda c: F.collect_list(c),
        lambda c: F.array_sort(F.flatten(F.collect_list(c))),
    ),
}


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Aggregate with an explicit salted pre-stage: stage 1 groups on
    (keys, salt) shrinking hot keys n_salts-fold; stage 2 merges the
    partials.

    ``aggs`` maps output name →
    ("count"|"sum"|"min"|"max"|"collect_list", column). The algebraic
    four exist for parity with Catalyst's own partial+final;
    "collect_list" is the case that actually NEEDS this operator (no
    map-side combine exists), returning a deterministically sorted
    array per key.
    """
    salted = df.withColumn("__salt", _salt_expr(df, n_salts, salt_on))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            _AGG_STAGES[kind][0](col).alias(f"__p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _AGG_STAGES[kind][1](f"__p_{name}").alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )


def skew_report(
    df: DataFrame,
    key_column: str,
    top_k: int = 5,
) -> DataFrame:
    """Key-skew diagnostic for a prospective join/aggregation key: the
    one-row report that tells you whether ``salted_join`` /
    ``two_stage_agg`` above are needed BEFORE the 100 TB job stalls on
    one reducer.

        gini = Σ_k (2k − n − 1)·x_(k) / (n·Σx)   (x ascending, rank k)

    0 = perfectly uniform key, →1 = all rows on one key. Tie handling
    is rank-order-invariant (equal x contribute the same regardless of
    their order within a tie block), which is exactly what makes the
    statistic computable WITHOUT a global per-key rank: all keys
    sharing a count x form one contiguous tie block, and a block of c
    keys starting after r smaller keys contributes
    ``x · (2·c·r + c·(c+1))`` to the 2·Σ rank·x numerator. The
    numerator accumulates in DECIMAL(38,0); the only floats are the
    final divisions.

    Plan — every stage bounded at any scale:
    1. ONE partial-aggregated shuffle reduces the data to the per-key
       count table (key-cardinality rows, never ranked globally).
    2. A second keyed agg folds that into the count-of-counts
       histogram. A table of ``total`` rows has at most ``√(2·total)``
       distinct per-key counts (the distinct counts 1+2+…+D ≤ total),
       so the cumulative-offset window over the histogram is a
       single-partition exchange over a *provably* √n-bounded table
       (~1.4M rows even at 10¹² input rows) — the same structural
       bound discipline as auc_score's distinct-score window, but here
       the bound needs no upstream quantization.
    3. top-k share uses sort+limit (TakeOrderedAndProject: per-
       partition top-k, then a k·partitions merge), never a global
       window.

    Returns one row: n_keys, total_rows, max_count, top{k}_share,
    gini — bit-identical to the naive global-rank formulation (unit
    test pins equality on fixtures).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_column).alias("k")).agg(
        F.count("*").alias("x")
    )
    hist = counts.groupBy("x").agg(F.count("*").alias("c"))
    # keys with a strictly smaller count = block rank offset r
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    blocks = hist.withColumn(
        "r", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long")
    )
    # block term: Σ_{i=1..c} 2(r+i)x = x·(2cr + c(c+1)). c and r are
    # key COUNTS, so a mostly-unique 10¹²-row table puts c ~ 10¹² in
    # one block and c·(c+1) ~ 10²⁴ — far past int64. Promote to
    # decimal(38,0) BEFORE the multiplications (decimal headroom
    # ~10³⁸ covers c, r ≤ ~10¹⁸ keys).
    c_d = F.col("c").cast("decimal(38,0)")
    r_d = F.col("r").cast("decimal(38,0)")
    stats = blocks.agg(
        F.sum("c").cast("long").alias("n_keys"),
        F.sum(F.col("x") * F.col("c")).cast("long").alias("total_rows"),
        F.max("x").cast("long").alias("max_count"),
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * (F.lit(2) * c_d * r_d + c_d * (c_d + F.lit(1)))
        ).alias("num_part"),
    )
    topk = (
        counts.orderBy(F.desc("x"), "k")
        .limit(top_k)
        .agg(F.sum("x").cast("long").alias("top_rows"))
    )
    # gini numerator: 2*sum(k*x) - (n+1)*sum(x) == sum((2k-n-1)x)
    return (
        stats.crossJoin(F.broadcast(topk))
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            "total_rows",
            "max_count",
            F.round(
                F.col("top_rows").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias(f"top{top_k}_share"),
            F.round(
                (
                    F.col("num_part")
                    - (F.col("n_keys") + F.lit(1)).cast("decimal(38,0)")
                    * F.col("total_rows")
                ).cast("double")
                / (
                    F.col("n_keys").cast("double")
                    * F.col("total_rows").cast("double")
                ),
                6,
            ).alias("gini"),
        )
    )
