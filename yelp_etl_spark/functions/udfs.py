"""Vectorized Python UDF surface: scalar pandas_udf, grouped-aggregate
pandas_udf, and grouped applyInPandas.

The reference registers no UDFs anywhere (SURVEY.md §2.10 — verified
absence); this module is the engine's declared UDF surface for the
cases where a real pipeline must run Python (model scoring, custom
statistics). Every entry point is Arrow-batched — the JVM hands
columnar batches to numpy/pandas, ~10-100× faster than row-at-a-time
Python UDFs — and each has an expression-only SQL equivalent used as
its DuckDB oracle, so the UDFs are value-checked, not just smoke-run.

At 100 TB: scalar UDFs are map-only (zero shuffle); grouped-agg UDFs
shuffle once on the group key like any aggregation but do NOT
partial-aggregate map-side (unlike built-in aggs) — prefer built-ins
when one exists; applyInPandas materializes each group in one Python
worker's memory, so group cardinality × group size needs the same
skew discipline as any window (salt pathological keys first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def logistic_score(x: pd.Series) -> pd.Series:
    """Scalar vectorized UDF: logistic squashing 1/(1+exp(-x)).
    Stand-in shape for any per-row model scorer."""
    return 1.0 / (1.0 + np.exp(-x))


@F.pandas_udf(T.DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-aggregate vectorized UDF: sum(v*w)/sum(w) per group.
    Used inside groupBy().agg() — one shuffle on the group key."""
    denom = w.sum()
    return float((v * w).sum() / denom) if denom else float("nan")


@F.pandas_udf(T.LongType())
def row_count(v: pd.Series) -> int:
    """Grouped-aggregate COUNT as a pandas UDF. Spark disallows mixing
    grouped-agg pandas UDFs with built-in aggregates in one agg() —
    pandas aggs can only combine with other pandas aggs — so UDF-based
    aggregations needing a count carry their own."""
    return len(v)


def group_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score via applyInPandas: each group arrives as one
    pandas DataFrame, gets (x - mean) / stddev (sample, ddof=1)
    appended, and streams back out. The canonical shape for per-group
    Python transforms that need the whole group at once (model-per-
    group fits, per-group normalization)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def transform(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col]
        sd = x.std(ddof=1)
        pdf[out_col] = (x - x.mean()) / sd if sd and sd == sd else np.nan
        return pdf

    return df.groupBy(group_col).applyInPandas(transform, out_schema)


def register_split_chunks_udtf(spark):
    """Python UDTF surface (Spark 3.5+/4): a user-defined TABLE function
    usable in SQL FROM/LATERAL position — the missing piece between
    scalar UDFs and applyInPandas when one input row must expand into a
    variable number of typed rows. Registered, it composes with the
    pure-SQL entry path (see tpch_q6_sql):

        SELECT d.doc_id, c.* FROM docs d, LATERAL split_chunks(d.text, 100) c

    UDTFs are row-at-a-time Python — keep them OFF the hot path (the
    set-oriented chunker, functions/text.py chunk_documents, does the
    same job with JVM generators); this exists for API completeness and
    for genuinely irregular row-expansion logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk string")
    class SplitChunks:
        def eval(self, text: str, size: int):
            if not text or size <= 0:
                return
            for i in range(0, len(text), size):
                yield (i // size, text[i : i + size])

    spark.udtf.register("split_chunks", SplitChunks)
    return SplitChunks


def cogrouped_asof_attribution(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    tolerance_days: int = 1,
) -> DataFrame:
    """Cogrouped-pandas surface (``groupBy().cogroup().applyInPandas``,
    the API tier above grouped applyInPandas): per key, BOTH sides'
    rows arrive as pandas frames in one Python call — the shape for
    pairwise per-key logic that neither a join nor a single-group
    transform expresses cleanly. Here: per-key backward as-of
    attribution — for each ``right`` event, does a ``left`` event
    precede it within ``tolerance_days``? (purchase→view attribution,
    label→feature time alignment). pandas ``merge_asof`` does the
    two-pointer merge per key.

    Returns (key, n_right, n_attributed) for keys with ≥1 right row.

    Scale: cogroup shuffles both sides once on the key and streams
    Arrow batches; per-key memory is one key's rows (same bound as
    any keyed window). Equality semantics are pinned: backward
    direction, ts_left ≤ ts_right, inclusive tolerance — the SQL
    twin is an EXISTS with the same bounds."""
    # the output key column carries the INPUT key's type — hardcoding
    # LongType would crash on string/date keys the signature accepts
    key_type = left.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("key", key_type),
            T.StructField("n_right", T.LongType()),
            T.StructField("n_attributed", T.LongType()),
        ]
    )
    tol = tolerance_days

    def merge(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if r.empty:
            return pd.DataFrame(
                {"key": [], "n_right": [], "n_attributed": []}
            ).astype({"n_right": "int64", "n_attributed": "int64"})
        r = r.sort_values(ts_col).reset_index(drop=True)
        if l.empty:
            matched = 0
        else:
            l2 = l.sort_values(ts_col).reset_index(drop=True)
            l2["__mark"] = 1
            m = pd.merge_asof(
                r[[ts_col]],
                l2[[ts_col, "__mark"]],
                on=ts_col,
                direction="backward",
                tolerance=pd.Timedelta(days=tol),
            )
            matched = int(m["__mark"].notna().sum())
        return pd.DataFrame(
            {
                "key": [key[0]],
                "n_right": [len(r)],
                "n_attributed": [matched],
            }
        )

    # Pre-partition both sides by key with an EXPLICIT width: the
    # cogroup's own exchange is then satisfied without a new shuffle,
    # and AQE's byte-based partition coalescing never sees it. Left to
    # AQE, the tiny (user_id, ts) shuffle coalesces to ~3 partitions —
    # correct for byte-bound stages, wrong here where cost is one
    # PYTHON call per key (guide §4): measured 3 tasks / ~3 s per
    # Arrow stage at sf0.1 vs full-width with this repartition (r15
    # optimization round). Width = defaultParallelism, the same
    # CPU-sized choice a cluster run wants.
    n_parts = left.sparkSession.sparkContext.defaultParallelism
    return (
        left.repartition(n_parts, key_col)
        .groupBy(key_col)
        .cogroup(right.repartition(n_parts, key_col).groupBy(key_col))
        .applyInPandas(merge, out_schema)
    )
