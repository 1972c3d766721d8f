"""transformWithState (Spark 4 stateful API) — skip-marked env boundary.

``running_user_totals_tws`` is the modern twin of the
applyInPandasWithState operator (tests/test_streaming.py covers that
one end to end). The transformWithState Python worker speaks a
protobuf-based state-server protocol, and this sandbox has no working
``google.protobuf`` package, so the streaming run cannot execute here;
the test skips with that reason and runs fully in any env with
protobuf installed (verified failure mode:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError
google.protobuf.descriptor).
"""

from __future__ import annotations

import tempfile

import pytest

from yelp_etl_spark.sources.readers import load_table


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason=(
        "transformWithStateInPandas needs the protobuf Python package "
        "(Arrow state-server protocol); not installed in this sandbox. "
        "Install protobuf to exercise the Spark 4 stateful API end to "
        "end; the applyInPandasWithState twin is fully tested in "
        "test_streaming.py."
    ),
)
def test_running_user_totals_tws_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from yelp_etl_spark.streaming.windows import (
        read_events_stream,
        running_user_totals_tws,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    d = tempfile.mkdtemp(prefix="events_tws_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)

    stream = running_user_totals_tws(
        read_events_stream(spark, d, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in spark.read.parquet(d)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    final: dict[int, tuple[int, float]] = {}
    for r in spark.table("t_tws").collect():
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            final[r.user_id] = (r.n_events, round(r.total_value, 6))
    assert final == batch
