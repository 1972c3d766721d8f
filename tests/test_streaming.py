"""Structured Streaming tests: the windowed aggregations must produce
the same results through readStream (availableNow trigger, memory sink)
as through the batch DataFrame path."""

from __future__ import annotations

import os
import tempfile

import pytest

from yelp_etl_spark.sources.readers import load_table
from yelp_etl_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events fixture re-materialized as a micro-timestamp parquet dir
    (streaming file source needs a directory it can list)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _rows(spark, name):
    return {tuple(r) for r in spark.table(name).collect()}


def test_tumbling_stream_matches_batch(spark, events_dir):
    batch = tumbling_window_agg(spark.read.parquet(events_dir), "10 minutes")
    stream = tumbling_window_agg(
        read_events_stream(spark, events_dir), "10 minutes", watermark="1 hour"
    )
    run_stream_to_memory(stream, "t_tumbling")
    assert _rows(spark, "t_tumbling") == {tuple(r) for r in batch.collect()}


def test_sliding_stream_matches_batch(spark, events_dir):
    batch = sliding_window_agg(spark.read.parquet(events_dir), "10 minutes", "5 minutes")
    stream = sliding_window_agg(
        read_events_stream(spark, events_dir), "10 minutes", "5 minutes", watermark="1 hour"
    )
    run_stream_to_memory(stream, "t_sliding")
    assert _rows(spark, "t_sliding") == {tuple(r) for r in batch.collect()}


def test_session_stream_matches_batch(spark, events_dir):
    batch = session_window_agg(spark.read.parquet(events_dir), "30 minutes")
    stream = session_window_agg(
        read_events_stream(spark, events_dir), "30 minutes", watermark="1 hour"
    )
    run_stream_to_memory(stream, "t_session")
    assert _rows(spark, "t_session") == {tuple(r) for r in batch.collect()}


def test_stream_dedup_drops_duplicates(spark, events_dir, tmp_path):
    from yelp_etl_spark.streaming.windows import read_events_stream, stream_dedup

    # duplicate every event into a second file set → stream must dedup
    dup_dir = str(tmp_path / "dup_events")
    base = spark.read.parquet(events_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)
    assert spark.read.parquet(dup_dir).count() == 2 * base.count()

    deduped = stream_dedup(read_events_stream(spark, dup_dir), ["event_id"], "10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("t_dedup").count() == base.count()
    # batch path: plain dropDuplicates
    assert stream_dedup(spark.read.parquet(dup_dir), ["event_id"]).count() == base.count()


def test_running_user_totals_stateful(spark, events_dir):
    from pyspark.sql import functions as F

    from yelp_etl_spark.streaming.windows import (
        read_events_stream,
        running_user_totals,
    )

    stream = running_user_totals(
        read_events_stream(spark, events_dir, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user = final running total = batch aggregate
    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    emitted = spark.table("t_state").collect()
    final = {}
    for r in emitted:  # update mode emits per micro-batch; keep max count
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            final[r.user_id] = (r.n_events, round(r.total_value, 6))
    assert final == batch
    assert len(emitted) >= len(batch)  # multiple micro-batches → re-emits


def test_incremental_micro_batches(spark, events_dir):
    """maxFilesPerTrigger forces multiple micro-batches; the final state
    must still equal the batch answer (update across triggers)."""
    stream = tumbling_window_agg(
        read_events_stream(spark, events_dir, max_files_per_trigger=1),
        "10 minutes",
        watermark="1 hour",
    )
    run_stream_to_memory(stream, "t_incremental")
    batch = tumbling_window_agg(spark.read.parquet(events_dir), "10 minutes")
    assert _rows(spark, "t_incremental") == {tuple(r) for r in batch.collect()}


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_dir):
    from yelp_etl_spark.streaming.windows import stream_static_enrich

    dim = load_table(spark, sf_dir, "customer")
    batch = stream_static_enrich(spark.read.parquet(events_dir), dim, "10 minutes")
    stream = stream_static_enrich(
        read_events_stream(spark, events_dir), dim, "10 minutes", watermark="1 hour"
    )
    run_stream_to_memory(stream, "t_enrich")
    assert _rows(spark, "t_enrich") == {tuple(r) for r in batch.collect()}


def test_foreach_batch_upsert_converges(spark, events_dir, tmp_path):
    """Streaming merge into a keyed parquet target equals the batch
    per-user aggregate over the same data (exactly-once contents)."""
    from pyspark.sql import functions as F

    from yelp_etl_spark.streaming.windows import foreach_batch_upsert

    stream = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    target = str(tmp_path / "serving")
    foreach_batch_upsert(
        stream, target, ["user_id"], str(tmp_path / "ckpt")
    )
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(target).collect()
    }
    want = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.heavy_rotation
def test_foreach_batch_upsert_partition_scoped(spark, tmp_path):
    """With partition_columns, a micro-batch touching one partition must
    leave every other partition's files byte-identical (never read,
    listed, or rewritten) while merging correctly into the touched one."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from yelp_etl_spark.streaming.windows import foreach_batch_upsert

    def _snap(target, part):
        d = os.path.join(target, part)
        return {
            f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if not f.startswith(("_", "."))
        }

    target = str(tmp_path / "serving")
    seed = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "user_id long, seg string, total double",
    )
    seed.coalesce(1).write.partitionBy("seg").parquet(target)
    before_b = _snap(target, "seg=b")
    before_c = _snap(target, "seg=c")

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 11.0), (5, "a", 50.0)],
        "user_id long, seg string, total double",
    ).write.parquet(src)
    stream = spark.readStream.schema(seed.schema).parquet(src)
    foreach_batch_upsert(
        stream,
        target,
        ["user_id", "seg"],  # partition cols must be part of the key
        str(tmp_path / "ckpt"),
        partition_columns=["seg"],
    )

    assert _snap(target, "seg=b") == before_b
    assert _snap(target, "seg=c") == before_c
    got = {
        (r.user_id, r.seg, r.total)
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        (1, "a", 11.0),  # updated
        (2, "a", 20.0),  # untouched row in touched partition survives
        (3, "b", 30.0),
        (4, "c", 40.0),
        (5, "a", 50.0),  # inserted
    }


@pytest.mark.heavy_rotation
def test_stream_stream_join_matches_batch(spark, events_dir):
    from pyspark.sql import functions as SF

    from yelp_etl_spark.streaming.windows import stream_stream_join

    batch_events = spark.read.parquet(events_dir)
    batch = stream_stream_join(
        batch_events.filter(SF.col("event_type") == "click"),
        batch_events.filter(SF.col("event_type") == "purchase"),
        within="30 minutes",
    )
    stream_events = read_events_stream(spark, events_dir)
    stream = stream_stream_join(
        stream_events.filter(SF.col("event_type") == "click"),
        read_events_stream(spark, events_dir).filter(
            SF.col("event_type") == "purchase"
        ),
        within="30 minutes",
    )
    # joins require append mode (no aggregation state to re-emit)
    q = (
        stream.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark, "t_ss_join")
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(want) > 0


def test_stream_stream_join_left_outer_batch(spark, events_dir):
    from pyspark.sql import functions as SF

    from yelp_etl_spark.streaming.windows import stream_stream_join

    batch_events = spark.read.parquet(events_dir)
    clicks = batch_events.filter(SF.col("event_type") == "click")
    purchases = batch_events.filter(SF.col("event_type") == "purchase")
    inner = stream_stream_join(clicks, purchases, within="30 minutes")
    outer = stream_stream_join(
        clicks, purchases, within="30 minutes", how="left_outer"
    )
    n_clicks = clicks.count()
    matched_left = inner.select("l_event_id").distinct().count()
    rows = outer.collect()
    # every click appears; unmatched ones carry null right columns
    unmatched = [r for r in rows if r["r_event_id"] is None]
    assert len(unmatched) == n_clicks - matched_left
    assert len(rows) == inner.count() + len(unmatched)
    assert n_clicks > matched_left > 0


def test_checkpoint_restart_processes_new_files_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across restarts — the core Structured Streaming
    guarantee a daily-ingest deployment leans on: run to completion,
    stop, land MORE files in the source dir, restart with the SAME
    checkpoint. The second run must process only the new files (no
    reprocessing: totals equal each file counted exactly once), because
    the checkpoint's file-source log records what was committed."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema(first.schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == events.count()  # nothing dropped, nothing doubled
    assert got.select(F.sum("value")).collect()[0][0] == pytest.approx(
        events.select(F.sum("value")).collect()[0][0], rel=1e-9
    )


def test_partition_scoped_upsert_rejects_movable_keys(spark, tmp_path):
    """partition_columns not covered by the merge keys = a key could
    move partitions and be duplicated by the pruned read — rejected."""
    import pytest as _pytest

    from yelp_etl_spark.streaming.windows import foreach_batch_upsert

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 1.0)], "user_id long, seg string, total double"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    with _pytest.raises(ValueError, match="subset of the merge keys"):
        foreach_batch_upsert(
            stream,
            str(tmp_path / "t"),
            ["user_id"],
            str(tmp_path / "ckpt"),
            partition_columns=["seg"],
        )


def test_partition_scoped_upsert_null_partition(spark, tmp_path):
    """Rows in the NULL partition must merge null-safely — the pruned
    read matches the null partition instead of pruning everything and
    wiping the pre-existing rows there."""
    from yelp_etl_spark.streaming.windows import foreach_batch_upsert

    target = str(tmp_path / "serving")
    seed = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "b", 30.0)],
        "user_id long, seg string, total double",
    )
    seed.coalesce(1).write.partitionBy("seg").parquet(target)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, None, 11.0)], "user_id long, seg string, total double"
    ).write.parquet(src)
    stream = spark.readStream.schema(seed.schema).parquet(src)
    foreach_batch_upsert(
        stream,
        target,
        ["user_id", "seg"],
        str(tmp_path / "ckpt"),
        partition_columns=["seg"],
    )
    got = {
        (r.user_id, r.seg, r.total)
        for r in spark.read.parquet(target).collect()
    }
    assert got == {(1, None, 11.0), (2, None, 20.0), (3, "b", 30.0)}


@pytest.mark.heavy_rotation
def test_foreach_batch_upsert_recovers_from_swap_crash(spark, events_dir, tmp_path):
    """Crash window of the rename-swap: between rename(target -> __old)
    and rename(__merging -> target) there is NO target dir, only the
    complete __old copy. The replay must restore __old as the merge
    base — not treat the table as empty (merged = batch only) and then
    delete __old, which would permanently lose every previously merged
    key the replayed stream does not re-emit."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from yelp_etl_spark.streaming.windows import foreach_batch_upsert

    def run(target, ckpt):
        stream = (
            spark.readStream.schema(spark.read.parquet(events_dir).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(events_dir)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        foreach_batch_upsert(stream, target, ["user_id"], ckpt)

    target = str(tmp_path / "serving")
    run(target, str(tmp_path / "ckpt"))
    # a key the stream never emits: only the pre-crash table holds it
    sentinel = spark.createDataFrame(
        [(99_999_999, 1, 1.0)], spark.read.parquet(target).schema
    )
    sentinel.write.mode("append").parquet(target)
    expected = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(target).collect()
    }

    # forge the mid-swap crash state: target gone, __old holds the
    # table, a stale __merging left over from the crashed attempt
    os.rename(target, target + "__old")
    os.makedirs(target + "__merging", exist_ok=True)

    # replay from a fresh checkpoint (the crashed batch re-delivers)
    run(target, str(tmp_path / "ckpt2"))

    assert os.path.isdir(target), "recovery must restore the target dir"
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(target).collect()
    }
    assert got == expected, "recovered table lost previously merged keys"
    assert not os.path.isdir(target + "__old")
    shutil.rmtree(target + "__merging", ignore_errors=True)
