"""Temporal join operators: as-of (point-in-time) and range joins.

Not present in the reference (SURVEY.md §2.4 "Not present: ... range/
as-of joins"); part of the engine's generalized query surface. Both are
compositions of existing DataFrame ops so Catalyst keeps planning:
equi-join on the keys with the range condition as a residual predicate
(sort-merge or broadcast), then a rank-1 window keyed on the left row id
— one extra shuffle.

Scale notes: this composition is quadratic in per-key right-side
fan-out (each left row matches all earlier right rows before rank-1
filtering). Right trade when the right side per key is modest (slowly
changing dimensions, order history). For two huge time-series, bucket
both sides by (key, coarse time bucket) so candidates join locally, or
merge per key partition with mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
) -> DataFrame:
    """For each left row, attach the single right row with the largest
    ``right_ts <= left_ts`` (backward; ``forward`` = smallest >=) among
    rows matching on the join keys. Left rows with no match keep NULL
    right columns (left-outer semantics, like pandas merge_asof).

    ``left_id`` must uniquely identify left rows (e.g. event_id) — it
    keys the rank-1 window, so no global row numbering is needed.
    ``tiebreak``: extra right column, ordered DESC, to break equal-ts
    ties deterministically.
    """
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
