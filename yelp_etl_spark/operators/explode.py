"""Lateral operators: delimited-string explode with surrogate keys.

Parity target (reference file:line): clean.py:54-57 — checkin's
comma-separated timestamp string becomes one row per timestamp plus a
synthetic ``checkin_id``.

The reference uses ``monotonically_increasing_id()`` (P8), which is
partition-layout-dependent — unstable across runs and cluster sizes.
``key_columns`` switches to a content-derived ``xxhash64`` surrogate
that is deterministic at any scale (SURVEY.md §7 watch-list item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_delimited(
    df: DataFrame,
    column: str,
    delimiter: str = ", ",
    output_column: str | None = None,
    id_column: str | None = None,
    key_columns: list[str] | None = None,
    keep_empty: bool = False,
) -> DataFrame:
    """One output row per delimited element of ``column``.

    id_column: name of a surrogate-key column to attach. With
    ``key_columns`` the key is xxhash64(*key_columns, element) —
    deterministic; without, monotonically_increasing_id() — reference
    parity but partition-dependent.
    keep_empty: use explode_outer to keep rows whose array is empty/null.
    """
    output_column = output_column or column
    exploder = F.explode_outer if keep_empty else F.explode
    parts = F.split(F.col(column), delimiter, limit=-1)
    out = df.withColumn("__element", exploder(parts))
    if column != output_column:
        out = out.withColumnRenamed("__element", output_column)
    else:
        out = out.drop(column).withColumnRenamed("__element", output_column)
    if id_column:
        if key_columns:
            out = out.withColumn(
                id_column, F.xxhash64(*key_columns, F.col(output_column))
            )
        else:
            out = out.withColumn(id_column, F.monotonically_increasing_id())
    return out
