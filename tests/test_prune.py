"""Tests for join-input pruning (operators/prune.py): the membership
prefilter must be a superset of the true match set (no false
negatives), and the prefiltered join must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_etl_spark.operators.prune import membership_prefilter, prefiltered_join


def _probe(spark):
    return spark.createDataFrame(
        [(i, f"k{i % 50}", float(i)) for i in range(400)],
        "id long, key string, v double",
    )


def _build(spark):
    # only 10 of the probe's 50 distinct keys are live
    return spark.createDataFrame(
        [(f"k{i}", f"name_{i}") for i in range(0, 50, 5)],
        "key string, name string",
    )


def test_prefilter_never_drops_matches(spark):
    probe, build = _probe(spark), _build(spark)
    true_ids = {
        r.id for r in probe.join(build, "key", "left_semi").select("id").collect()
    }
    got_ids = {
        r.id
        for r in membership_prefilter(probe, "key", build, "key")
        .select("id")
        .collect()
    }
    assert true_ids <= got_ids
    assert len(true_ids) > 0


def test_tiny_bucket_space_still_exact_after_join(spark):
    # force false positives with a 4-bucket "bloom"; the exact join
    # must still drop them
    probe, build = _probe(spark), _build(spark)
    pre = membership_prefilter(probe, "key", build, "key", num_buckets=4)
    assert pre.count() > probe.join(build, "key", "left_semi").count()
    plain = {
        tuple(r)
        for r in probe.join(build, "key").select("id", "name").collect()
    }
    pruned = {
        tuple(r)
        for r in prefiltered_join(probe, build, on="key", num_buckets=4)
        .select("id", "name")
        .collect()
    }
    assert pruned == plain


def test_prefiltered_join_distinct_key_names(spark):
    probe, build = _probe(spark), _build(spark)
    b = build.withColumnRenamed("key", "bkey")
    plain = {
        tuple(r)
        for r in probe.join(b, F.col("key") == F.col("bkey"))
        .select("id", "name")
        .collect()
    }
    got = {
        tuple(r)
        for r in prefiltered_join(probe, b, probe_key="key", build_key="bkey")
        .select("id", "name")
        .collect()
    }
    assert got == plain


def test_probe_preserving_joins_rejected(spark):
    probe, build = _probe(spark), _build(spark)
    with pytest.raises(ValueError):
        prefiltered_join(probe, build, on="key", how="left_outer")


def test_prefilter_is_broadcast_no_probe_shuffle(spark):
    """The prefilter itself must plan as a broadcast join: no Exchange
    on the probe side before the semi join."""
    probe, build = _probe(spark), _build(spark)
    plan = (
        membership_prefilter(probe, "key", build, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
