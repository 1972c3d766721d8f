"""Training-corpus curation operators: repetition/quality gating,
benchmark decontamination, mixture reweighting, and shard assignment.

These are the corpus-level gates an LLM-data pipeline runs between raw
text and training shards (the reference has no analog — its pipeline
stops at cleaned+enriched tables; this is extension surface like
functions/dedup.py and functions/sampling.py):

- ``repetition_metrics``: Gopher-style repetition signals (most-common
  word share, duplicate n-gram fraction) — heavily repetitive documents
  correlate with boilerplate/spam and are down-weighted or dropped.
- ``decontaminate``: flag documents sharing any token n-gram with a
  benchmark/eval set so evaluation data can be excluded from training.
- ``mixture_sample``: deterministic per-group sampling rates (e.g.
  re-balance languages or sources toward a target mixture).
- ``shard_assignment``: stable (shard, position) for writing training
  shards — a pure function of the document key, reproducible across
  runs and engines.

Every operator is deterministic and engine-portable (md5-based
decisions, no RNG, no Python UDF in the hot path), so each catalog
query has an exact DuckDB oracle.

Scale notes: repetition metrics cost one explode + keyed agg on doc_id
(token rows never leave their doc's partition grouping); contamination
is a broadcast semi-join against the (small) benchmark shingle set;
mixture sampling is a scan-level filter; shard positions are one
shuffle on shard id. Nothing is all-pairs; nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yelp_etl_spark.functions.sampling import fraction_threshold, hash_prefix
from yelp_etl_spark.functions.text import tokens


def _token_ngrams(tok: Column, n: int) -> Column:
    """Array of space-joined token n-grams (plan-time expression).
    Guarded: F.sequence(1, stop) with stop < 1 would generate a
    DESCENDING [1, 0] sequence, so short docs return an empty array."""
    count = F.size(tok) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + j) for j in range(n)]
        ),
    )
    return F.when(count > 0, grams).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality gates):

    - ``n_tokens``
    - ``top_word_frac``: share of tokens taken by the most frequent
      token (mode share) — boilerplate pushes this up.
    - ``dup_ngram_frac``: 1 − distinct/total token ``ngram``-grams —
      near 1.0 for looped/templated text.

    Shapes: dup_ngram_frac is a map-only array expression; the mode
    share is explode → (doc, token) partial-agg → max/sum per doc (two
    hash aggregates over one shuffle on the doc key; token rows carry
    only ids + token). Lowercased word tokens match functions.text.
    """
    tok = tokens(F.col(text_col))
    grams = _token_ngrams(tok, ngram)
    base = df.select(
        F.col(id_col),
        tok.alias("__tok"),
        F.size(tok).cast("long").alias("n_tokens"),
        F.when(
            F.size(grams) > 0,
            F.round(
                1.0
                - F.size(F.array_distinct(grams))
                / F.size(grams).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )
    counts = (
        base.select(id_col, F.explode("__tok").alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    return (
        base.drop("__tok")
        .join(counts, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_ngram_frac",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("__top") / F.col("n_tokens").cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("top_word_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    keep_clean: bool = True,
) -> DataFrame:
    """Benchmark decontamination: drop (or flag) training documents
    that share ANY token ``ngram``-gram with the benchmark set.

    The benchmark side reduces to its DISTINCT shingle set — small by
    construction (eval sets are thousands of docs, not billions) — and
    broadcasts into a semi-join against the training side's exploded
    shingles; matched ids then anti-join (keep_clean) back onto the
    full rows. Training text is scanned once; nothing shuffles except
    the matched-id set.
    """
    doc_sh = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(_token_ngrams(tokens(F.col(text_col)), ngram))
        ).alias("__sh"),
    )
    bench_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(_token_ngrams(tokens(F.col(text_col)), ngram))
            ).alias("__sh")
        )
        .distinct()
    )
    dirty_ids = (
        doc_sh.join(F.broadcast(bench_sh), "__sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if keep_clean else "left_semi"
    return docs.join(dirty_ids, id_col, how)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic mixture reweighting: keep a per-group fraction of
    rows (e.g. downsample an over-represented language toward a target
    corpus mixture). Decisions are a pure function of the row key (md5
    prefix, as in functions/sampling.py), so the sample is stable
    across runs/engines/repartitioning and composes with splits. Pure
    scan-level filter: no shuffle, no state."""
    prefix = hash_prefix(F.col(key_col))
    cond = F.lit(None).cast("boolean")
    expr = None
    for group, rate in sorted(rates.items()):
        branch = prefix < F.lit(fraction_threshold(rate))
        expr = (
            F.when(F.col(group_col) == group, branch)
            if expr is None
            else expr.when(F.col(group_col) == group, branch)
        )
    cond = (
        expr.otherwise(prefix < F.lit(fraction_threshold(default_rate)))
        if expr is not None
        else prefix < F.lit(fraction_threshold(default_rate))
    )
    return df.filter(cond)


def shard_assignment(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Stable training-shard layout: every key gets a shard (md5-hash
    mod n_shards) and a position within the shard (rank by hash, key
    as tiebreak) — the deterministic global shuffle used to write
    training shards. One exchange on shard id; within-shard ordering
    is a local sort. Output: (key, shard, pos)."""
    # 15 hex digits < 2^60 fits a BIGINT exactly (16 digits could not)
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    return (
        df.select(
            F.col(key_col),
            h.alias("__h"),
        )
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(key_col, "shard", "pos")
    )
