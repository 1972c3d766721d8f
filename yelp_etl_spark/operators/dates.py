"""Date-feature derivation (reference clean.py:213-233, D1-D8).

Given a string timestamp column and its format, derive the calendar
feature set the reference attaches to every fact table: parsed
timestamp, date, week-start date, ISO week, quarter, day-of-week, month,
year. ``{c}_year`` doubles as the identity partition column downstream
(run-all-pipelines.sh:138).

Unlike the reference this does NOT require
spark.sql.legacy.timeParserPolicy=LEGACY — the formats used
(yyyy-MM-dd[ HH:mm:ss]) parse identically under the Spark 3+/4 parser
(SURVEY.md §7 watch-list item 2).

All expressions are Catalyst built-ins → whole-stage codegen, no Python
on executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_feature_columns(
    source: Column | str,
    name: str,
    timestamp_format: str | None = "yyyy-MM-dd",
) -> list[Column]:
    """The 8 derived columns (D1-D8). ``timestamp_format=None`` means the
    source is already a timestamp/date column (the fixture tables' case).
    """
    col = F.col(source) if isinstance(source, str) else source
    ts = F.to_timestamp(col, timestamp_format) if timestamp_format else col.cast("timestamp")
    return [
        ts.alias(f"{name}_ts"),
        F.to_date(ts).alias(f"{name}_date"),
        F.to_date(F.date_trunc("week", ts)).alias(f"{name}_week_start_date"),
        F.weekofyear(ts).alias(f"{name}_week"),
        F.quarter(ts).alias(f"{name}_quarter"),
        F.dayofweek(ts).alias(f"{name}_dayofweek"),
        F.month(ts).alias(f"{name}_month"),
        F.year(ts).alias(f"{name}_year"),
    ]


def add_date_features(
    df: DataFrame,
    column: str,
    timestamp_format: str | None = "yyyy-MM-dd",
    drop_source: bool = True,
) -> DataFrame:
    """Attach the feature set for ``column`` (clean.py:140-146 drops the
    consumed raw string column afterwards)."""
    out = df.select("*", *date_feature_columns(column, column, timestamp_format))
    return out.drop(column) if drop_source else out
