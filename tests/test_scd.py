"""Unit tests for upsert/SCD operators (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

from yelp_etl_spark.operators.scd import merge_upsert, scd2_history


def ts(s):
    return datetime.fromisoformat(s)


def test_merge_upsert_replaces_matched_keeps_unmatched(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    source = spark.createDataFrame([(2, "B"), (4, "D")], "id long, v string")
    got = {r.id: r.v for r in merge_upsert(target, source, ["id"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_scd2_history_runs_and_intervals(spark):
    snaps = spark.createDataFrame(
        [
            (1, ts("2024-01-01"), "new", 10),
            (1, ts("2024-01-05"), "new", 11),      # no change → folded into run
            (1, ts("2024-01-09"), "active", 12),
            (1, ts("2024-02-01"), "closed", 13),
            (2, ts("2024-01-03"), "new", 14),
        ],
        "k long, t timestamp, status string, seq long",
    )
    rows = scd2_history(snaps, "k", "t", "status", tiebreak="seq").collect()
    hist = {(r.k, r.status): (r.valid_from, r.valid_to) for r in rows}
    assert hist[(1, "new")] == (ts("2024-01-01"), ts("2024-01-09"))
    assert hist[(1, "active")] == (ts("2024-01-09"), ts("2024-02-01"))
    assert hist[(1, "closed")] == (ts("2024-02-01"), None)  # current
    assert hist[(2, "new")] == (ts("2024-01-03"), None)
    assert len(rows) == 4


def test_snapshot_diff_classification(spark):
    from yelp_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, 40.0)], "k long, v double"
    )
    out = {r.k: (r.diff_status, r.v) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out[1] == ("removed", 10.0)
    assert out[2] == ("changed", 25.0)   # new-side value surfaced
    assert out[3] == ("unchanged", None)  # NULL == NULL (null-safe)
    assert out[4] == ("added", 40.0)
