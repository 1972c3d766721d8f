"""Tests for skew mitigation operators (operators/skew.py): salted
results must equal their unsalted equivalents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_etl_spark.operators.skew import salted_join, two_stage_agg

from rounding_ref import half_up


def _skewed_fact(spark):
    # key "hot" carries 90% of rows
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(200)]
    return spark.createDataFrame(rows, "id long, key string, v double")


def _dim(spark):
    keys = {"hot"} | {f"k{i}" for i in range(0, 200, 10)}
    return spark.createDataFrame(
        [(k, f"name_{k}") for k in sorted(keys)], "key string, name string"
    )


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = {tuple(r) for r in fact.join(dim, "key").select("id", "name").collect()}
    salted = {
        tuple(r)
        for r in salted_join(fact, dim, "key", n_salts=8)
        .select("id", "name")
        .collect()
    }
    assert salted == plain


def test_salted_join_left_outer(spark):
    fact = _skewed_fact(spark)
    dim = _dim(spark).filter(F.col("key") != "hot")  # hot key unmatched
    plain = {
        tuple(r)
        for r in fact.join(dim, "key", "left").select("id", "name").collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(fact, dim, "key", n_salts=8, how="left")
        .select("id", "name")
        .collect()
    }
    assert salted == plain


def test_two_stage_agg_matches_plain_agg(spark):
    fact = _skewed_fact(spark)
    plain = {
        tuple(r)
        for r in fact.groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in two_stage_agg(
            fact,
            ["key"],
            {"n": ("count", "v"), "total": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_is_deterministic(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    a = sorted(map(tuple, salted_join(fact, dim, "key").collect()))
    b = sorted(map(tuple, salted_join(fact.repartition(7), dim, "key").collect()))
    assert a == b

def test_two_stage_collect_list_matches_sorted_plain(spark):
    """The non-decomposable stage pair: salted partial lists, merged by
    flatten + array_sort, must equal a plain sorted collect_list."""
    fact = _skewed_fact(spark)
    plain = {
        (r.key, tuple(r.vs))
        for r in fact.groupBy("key")
        .agg(F.array_sort(F.collect_list("v")).alias("vs"))
        .collect()
    }
    salted = {
        (r.key, tuple(r.vs))
        for r in two_stage_agg(
            fact, ["key"], {"vs": ("collect_list", "v")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_skew_report_gini_matches_bruteforce_rank_formula(spark):
    """The histogram-block Gini must be bit-identical to the naive
    global-rank formula gini = (2·Σ k·x_(k) − (n+1)·Σx) / (n·Σx)."""
    from yelp_etl_spark.operators.skew import skew_report

    # irregular counts incl. ties: key i appears (i % 7) + 1 + (i == 3) * 40 times
    rows = [(f"k{i}",) for i in range(23) for _ in range((i % 7) + 1 + (i == 3) * 40)]
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, "k", top_k=3).collect()[0]

    counts = sorted((i % 7) + 1 + (i == 3) * 40 for i in range(23))
    n, tot = len(counts), sum(counts)
    num = 2 * sum((k + 1) * x for k, x in enumerate(counts)) - (n + 1) * tot
    assert got.n_keys == n and got.total_rows == tot
    assert got.max_count == max(counts)
    assert got.top3_share == half_up(sum(sorted(counts)[-3:]) / tot)
    assert got.gini == half_up(num / (n * tot))


def test_skew_report_uniform_vs_concentrated(spark):
    """Gini ~0 for a perfectly uniform key, high for a hot key; the
    heavy-key share and counts are exact."""
    from pyspark.sql import functions as F

    from yelp_etl_spark.operators.skew import skew_report

    uniform = spark.range(1000).select((F.col("id") % 10).alias("k"))
    r = skew_report(uniform, "k", top_k=5).collect()[0]
    assert r.n_keys == 10 and r.total_rows == 1000 and r.max_count == 100
    assert r.gini == 0.0 and r.top5_share == 0.5
    hot = spark.range(1000).select(
        F.when(F.col("id") < 910, 0).otherwise(F.col("id") % 10).alias("k")
    )
    h = skew_report(hot, "k", top_k=5).collect()[0]
    assert h.max_count == 919 and h.gini > 0.7
    a = skew_report(hot.repartition(7), "k", top_k=5).collect()
    assert a == skew_report(hot, "k", top_k=5).collect()
