"""Temporal join operators: as-of (point-in-time) and range joins.

Not present in the reference (SURVEY.md §2.4 "Not present: ... range/
as-of joins"); part of the engine's generalized query surface.

The as-of join uses the union-merge idiom rather than join-then-rank:
tag both sides, union them, and take a running ``last(payload,
ignorenulls)`` over a per-key window ordered by time. Cost is ONE
shuffle of |left| + |right| rows and a per-key sort — independent of
the per-key match fan-out. The join-then-rank formulation (kept as
``asof_join_ranked`` for differential testing) materializes every
(left row × earlier right row) pair before the rank-1 filter, which is
quadratic for deep per-key histories and needs a second shuffle for
the window; at 100 TB the merge form is the only one that survives.

Remaining skew consideration for the merge form: a single hot key
lands in one window partition. For pathological keys, pre-bucket both
sides by (key, coarse time bucket) and run the merge per bucket,
carrying the last payload of the previous bucket forward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _and_all(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    right_ts: str,
    left_keys: list[str],
    right_keys: list[str],
    right_columns: list[str] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (backward; ``forward`` = smallest >=) among
    rows matching on the join keys. Left rows with no match keep NULL
    right columns (left-outer semantics, like pandas merge_asof).

    ``tolerance_seconds`` (merge_asof's ``tolerance``): a match further
    than this from the left timestamp is nulled out — stale quotes
    don't attach to trades. Applied as a post-merge column mask, so it
    adds zero shuffles; units are seconds for timestamp columns (both
    sides cast to epoch seconds) and raw units for numeric ones.

    Implementation: union-merge (see module docstring) — single
    shuffle, no pairwise blow-up. ``tiebreak``: extra right column;
    among equal-``right_ts`` matches the row with the LARGEST tiebreak
    wins (deterministic). ``left_id`` is part of the output contract
    (it must uniquely identify left rows) but the merge form needs no
    per-left-row window, so it is not shuffled on.
    """
    right_cols = right_columns or [
        c for c in right.columns if c not in right_keys and c != right_ts
    ]
    key_names = [f"__k_{i}" for i in range(len(left_keys))]

    # Right rows with a NULL key or NULL ts can never match (SQL null
    # comparison semantics) — drop them before the union.
    rsel = right
    for c in [*right_keys, right_ts]:
        rsel = rsel.filter(F.col(c).isNotNull())

    payload_type = T.StructType(
        [T.StructField("__rts", rsel.schema[right_ts].dataType)]
        + [T.StructField(c, rsel.schema[c].dataType) for c in right_cols]
    )
    tb_type = rsel.schema[tiebreak].dataType if tiebreak else T.IntegerType()

    rtagged = rsel.select(
        *[F.col(k).alias(kn) for k, kn in zip(right_keys, key_names)],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        (F.col(tiebreak) if tiebreak else F.lit(None)).cast(tb_type).alias("__tb"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{i}")
            for i, c in enumerate(left.columns)
        ],
    )
    ltagged = left.select(
        *[F.col(k).alias(kn) for k, kn in zip(left_keys, key_names)],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c).alias(f"__l_{i}") for i, c in enumerate(left.columns)],
    )

    # Sort so that at equal ts, right rows precede left rows (a match
    # AT the left timestamp counts for both directions), and among
    # equal-ts right rows the max tiebreak sorts last (running `last`
    # picks it). NULL left timestamps sort first → NULL payload, which
    # matches the join formulation (comparison with NULL never true).
    ts_order = (
        F.asc_nulls_first("__ts") if direction == "backward"
        else F.desc_nulls_first("__ts")
    )
    w = (
        Window.partitionBy(*key_names)
        .orderBy(ts_order, F.asc("__tag"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ltagged.unionByName(rtagged)
    matched = merged.withColumn(
        "__last", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        # date/timestamp → epoch seconds via timestamp (a date cannot
        # cast to double directly; numerics round-trip unchanged)
        def _secs(c: Column) -> Column:
            return c.cast("timestamp").cast("double")

        gap = _secs(F.col("__ts")) - _secs(F.col("__last.__rts"))
        if direction != "backward":
            gap = -gap
        matched = matched.withColumn(
            "__last",
            F.when(
                gap <= F.lit(float(tolerance_seconds)), F.col("__last")
            ).otherwise(F.lit(None).cast(payload_type)),
        )
    return (
        matched
        .select(
            *[F.col(f"__l_{i}").alias(c) for i, c in enumerate(left.columns)],
            F.col("__last.__rts").alias(f"asof_{right_ts}"),
            *[F.col(f"__last.{c}").alias(c) for c in right_cols],
        )
    )


def asof_join_ranked(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_ts: str,
    right_ts: str,
    left_keys: list[str],
    right_keys: list[str],
    right_columns: list[str] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """Join-then-rank formulation of the as-of join (see module
    docstring). Same semantics as ``asof_join``; kept as the
    differential-test anchor and for the case where the right side is
    tiny and broadcastable (no shuffle at all beats one shuffle)."""
    right_cols = right_columns or [
        c for c in right.columns if c not in right_keys and c != right_ts
    ]
    rsel = right.select(
        *[F.col(k).alias(f"__rk_{i}") for i, k in enumerate(right_keys)],
        F.col(right_ts).alias("__rts"),
        *right_cols,
    )
    conds = [left[lk] == rsel[f"__rk_{i}"] for i, lk in enumerate(left_keys)]
    if direction == "backward":
        conds.append(rsel["__rts"] <= left[left_ts])
        order = [F.desc("__rts")]
    else:
        conds.append(rsel["__rts"] >= left[left_ts])
        order = [F.asc("__rts")]
    if tiebreak:
        order.append(F.desc(tiebreak))

    joined = left.join(rsel, _and_all(conds), "left")
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *[f"__rk_{i}" for i in range(len(right_keys))])
        .withColumnRenamed("__rts", f"asof_{right_ts}")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[tuple[str, str]],
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join plus a residual range predicate (e.g. event time within
    an interval). Expressed declaratively so Catalyst plans the equi part
    as a hash/sort-merge join and applies the range condition as a
    post-join filter — never a cartesian product when equi keys exist."""
    conds = [left[lk] == right[rk] for lk, rk in equi_keys]
    conds.append(range_cond)
    return left.join(right, _and_all(conds), how)


def ewma(
    df: DataFrame,
    key_column: str,
    order_columns: list[str],
    value_column: str,
    alpha: float = 0.2,
    span: int = 20,
    output_column: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average over the trailing ``span``
    rows per key (pandas ``ewm(alpha=..., adjust=True)`` semantics,
    truncated to the window): weights (1-alpha)^age, normalized over
    the rows actually present.

    One ranking window carries a ``collect_list`` frame; the weighted
    sum and the normalizer are Horner-style ``F.aggregate`` folds
    (acc·decay + x), so the arithmetic is pure multiply/add — no pow(),
    whose libm rounding differs across engines/platforms. Single
    shuffle on the key; per-row state is bounded by ``span``, not the
    key's history, so the window never buffers a hot key's full
    timeline.
    """
    decay = F.lit(1.0 - alpha)
    w = (
        Window.partitionBy(key_column)
        .orderBy(*order_columns)
        .rowsBetween(-(span - 1), Window.currentRow)
    )
    lst = F.collect_list(F.col(value_column)).over(w)
    weighted = F.aggregate(
        lst, F.lit(0.0), lambda acc, x: acc * decay + x
    )
    norm = F.aggregate(
        lst, F.lit(0.0), lambda acc, _: acc * decay + F.lit(1.0)
    )
    return df.withColumn(output_column, weighted / norm)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_column: str,
    grid_seconds: int,
    left_cols: tuple[str, str, str] = ("l_id", "l_start", "l_end"),
    right_cols: tuple[str, str, str] = ("r_id", "r_start", "r_end"),
) -> DataFrame:
    """Interval-overlap join: all (left, right) pairs of the same key
    whose half-open time intervals intersect (l_start < r_end AND
    r_start < l_end).

    Scale strategy: the naive form is an equi-join on the key with the
    overlap predicate as a residual — per-key cost is |L_k|×|R_k|,
    quadratic for hot keys. Here each interval instead explodes into
    the coarse grid cells it covers, the join runs on (key, cell) —
    per-cell cost only — and duplicate pairs (intervals sharing several
    cells) collapse via dropDuplicates on the id pair before the exact
    predicate. Choose ``grid_seconds`` ≈ the typical interval length:
    shorter grids multiply cells/interval, longer grids multiply
    candidates/cell. All time arithmetic is integer epoch-micros, so
    results are engine-exact.

    Inputs must be pre-projected to (key, id, start, end) under the
    given column names; timestamps in, pairs with both id/start/end
    sets out.
    """
    g = int(grid_seconds) * 1_000_000
    l_id, l_start, l_end = left_cols
    r_id, r_start, r_end = right_cols

    def cells(start: str, end: str) -> Column:
        # `/` compiles to double division; exact here because epoch-micros
        # < 2^53 and exact multiples of g divide to exact integers, so
        # floor never straddles a cell boundary (positive epochs only)
        return F.sequence(
            F.floor(F.unix_micros(F.col(start)) / g),
            F.floor((F.unix_micros(F.col(end)) - 1) / g),
        )

    lc = left.withColumn("__cell", F.explode(cells(l_start, l_end)))
    rc = right.withColumn("__cell", F.explode(cells(r_start, r_end)))
    # exact predicate BEFORE the pair dedup: non-overlapping candidates
    # never reach the dedup shuffle
    return (
        lc.join(rc, [key_column, "__cell"])
        .filter(
            (F.unix_micros(F.col(l_start)) < F.unix_micros(F.col(r_end)))
            & (F.unix_micros(F.col(r_start)) < F.unix_micros(F.col(l_end)))
        )
        .dropDuplicates([l_id, r_id])
        .drop("__cell")
    )
