"""Cleaning operators: nullish-string normalization and validated casts.

Parity targets (reference file:line):
- T1/T2/T3+F1 unicode-prefix strip + literal normalization:
  clean.py:69-94 (regex repair before JSON parsing)
- P7 "safe convert": clean.py:182-210 — try an ordered list of target
  types, accept the first cast that introduces NO new NULLs, else keep
  the string.

The reference's safe_convert runs one eager ``.collect()`` null-count
aggregate per (column, candidate type) — O(100) driver round-trips for
business's ~39 attribute columns (SURVEY.md §3.2). At 100 TB each probe
is a full-table scan, so that design is catastrophic. Here the probe is
ONE aggregate job for ALL (column, candidate) pairs: a single scan
computes every null count, the driver picks winners, and the final plan
bakes in only the chosen casts (two scans total regardless of column
count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, MapType

# Repairs the reference applies to stringly-typed attribute values before
# attempting JSON/boolean casts (clean.py:69-94):
#   u'Value' → Value      (python-2 unicode repr prefix, whole-string)
#   u'...'   → ...        (same, embedded inside map-like strings)
#   'none'/'None' → null  (textual nulls)
#   True/False → true/false (python → JSON booleans)
_REPAIRS: list[tuple[str, str]] = [
    (r"^u'(.*)'$", r"$1"),
    (r"u'(.*?)'", r"'$1'"),
    (r"'[Nn]one'", "null"),
    (r"\bTrue\b", "true"),
    (r"\bFalse\b", "false"),
]


def normalize_nullish_string(column: Column) -> Column:
    """Repair one stringly-typed value column; whole-string 'none'
    (case-insensitive) becomes NULL (clean.py:79-84)."""
    repaired = column
    for pattern, replacement in _REPAIRS:
        repaired = F.regexp_replace(repaired, pattern, replacement)
    return F.when(F.lower(column) == "none", None).otherwise(repaired)


def normalize_nullish_strings(df: DataFrame, columns: list[str]) -> DataFrame:
    return df.withColumns({c: normalize_nullish_string(F.col(c)) for c in columns})


def _cast_expr(column: Column, target: DataType) -> Column:
    """Cast a string column to a candidate type. Maps parse via
    from_json (clean.py:199); scalars via try_cast — malformed values
    become NULL (and thus reject the candidate) instead of raising under
    ANSI mode (Spark 4 default; the reference ran pre-ANSI 3.5)."""
    if isinstance(target, MapType):
        return F.from_json(column, target)
    return column.try_cast(target)


# Spark's string→integral cast trims chars <= 0x20 then requires
# optional sign + digits only (no decimal point, no exponent); boolean
# accepts the trimmed, case-insensitive literal set below. Both
# grammars are exactly characterizable, so a regex can pre-reject.
_INT_GUARD = r"^[\x00-\x20]*[+-]?[0-9]+[\x00-\x20]*$"
_BOOL_GUARD = r"^[\x00-\x20]*(?i:true|false|t|f|y|n|yes|no|1|0)[\x00-\x20]*$"


def _probe_cast_expr(
    column: Column, target: DataType, source_is_string: bool = True
) -> Column:
    """Probe-side twin of _cast_expr: a try_cast that FAILS on a string
    row costs ~8.5 µs (the JVM exception path inside TRY eval-mode),
    ~100× a regex reject — and probe columns are exactly the ones
    expected to fail en masse. For types whose accept-grammar is a
    regex (integral, boolean), pre-guard: the guard is a NECESSARY
    condition for cast success (property-tested against try_cast on
    fuzzed inputs), so when(guard, try_cast) has identical null-ness.
    Only the probe null-counts use this; the final output column is
    always the real cast (_cast_expr), so emitted values can never
    depend on the guard.

    The guard grammar characterizes STRING→target casts only, so it
    applies only when ``source_is_string`` — e.g. DOUBLE→LONG succeeds
    via numeric conversion while rlike would stringify 3.0 to '3.0'
    and wrongly reject it (and numeric sources have no exception-path
    cost to avoid in the first place)."""
    from pyspark.sql.types import BooleanType, IntegralType

    if not source_is_string:
        return _cast_expr(column, target)
    if isinstance(target, IntegralType):
        guard = _INT_GUARD
    elif isinstance(target, BooleanType):
        guard = _BOOL_GUARD
    else:
        return _cast_expr(column, target)
    return F.when(column.rlike(guard), _cast_expr(column, target))


def safe_cast(
    df: DataFrame,
    candidates: dict[str, list[DataType]],
) -> DataFrame:
    """For each column, apply the first candidate cast that introduces no
    new NULLs; otherwise keep the original column.

    Reference semantics: clean.py:203-207 (accept iff casted null count
    <= original null count). Single-pass probe: one aggregate computes
    every (column, candidate) null count in one scan.
    """
    from pyspark.sql.types import StringType

    probe_exprs: list[Column] = []
    for col_name, types in candidates.items():
        is_string = isinstance(df.schema[col_name].dataType, StringType)
        probe_exprs.append(
            F.count(F.when(F.col(col_name).isNull(), 1)).alias(f"{col_name}__orig")
        )
        for i, t in enumerate(types):
            probe_exprs.append(
                F.count(
                    F.when(
                        _probe_cast_expr(F.col(col_name), t, is_string).isNull(),
                        1,
                    )
                ).alias(f"{col_name}__{i}")
            )
    if not probe_exprs:
        return df
    counts = df.agg(*probe_exprs).collect()[0].asDict()

    chosen: dict[str, Column] = {}
    for col_name, types in candidates.items():
        for i, t in enumerate(types):
            if counts[f"{col_name}__{i}"] <= counts[f"{col_name}__orig"]:
                chosen[col_name] = _cast_expr(F.col(col_name), t)
                break
    return df.withColumns(chosen) if chosen else df
