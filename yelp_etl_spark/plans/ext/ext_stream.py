"""Extension catalog — stream queries."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_etl_spark.sources.readers import load_table

from yelp_etl_spark.plans.ext._shared import (  # noqa: F401
    EXTRA_QUERIES,
    _t,
)


def _stage_sentinel_file(root: str, phase: int, max_ts, uid: int, days: int) -> None:
    """Write one far-future 1-row sentinel parquet file directly with
    pyarrow (r15 optimization round: each sentinel was previously a
    createDataFrame + repartition(1) Spark write — four scheduled jobs
    per expiry-join query for four single-row files). Same schema the
    stream reader declares (user_id long, ts timestamp, event_id long,
    value double), same mtime pinning; the sentinel's only job is to
    march the watermark, and it is filtered out of results by key sign
    exactly as before."""
    import os as _os
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "user_id": pa.array([uid], pa.int64()),
            "ts": pa.array([max_ts + timedelta(days=days)], pa.timestamp("us", tz="UTC")),
            "event_id": pa.array([-1], pa.int64()),
            "value": pa.array([0.0], pa.float64()),
        }
    )
    dst = _os.path.join(root, f"{phase:02d}.parquet")
    pq.write_table(tbl, dst)
    base = 1_700_000_000 + phase * 60  # strictly increasing mtimes:
    _os.utime(dst, (base, base))  # the source lists by (mtime, path)



def q_stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained distinct counts under streaming
    ingestion: the portable HLL register table (functions/sketches.py)
    IS the streaming aggregation state — groupBy(type, bucket).max(rho)
    over a 2-micro-batch file stream, complete-mode to a memory sink.
    HLL's defining mergeability (cellwise max) makes the micro-batch
    order irrelevant, so the streamed registers — and therefore the
    ESTIMATE — are bit-identical to a batch build over the same
    events, which is exactly what the DuckDB oracle computes. This is
    the 100 TB pattern for live distinct-user dashboards: state is
    ≤ groups×512 cells forever, not a distinct-set that grows with
    users; each micro-batch shuffles only register cells.

    Extends the reference's static event aggregation (reference
    yelp_etl/tasks/clean.py event rollups) to continuous ingestion."""
    import os
    import tempfile
    import uuid

    from yelp_etl_spark.functions.sketches import (
        hll_portable_estimate,
        hll_portable_sketch,
    )
    from yelp_etl_spark.streaming.windows import run_stream_to_memory

    from yelp_etl_spark.session import scratch_root

    workdir = tempfile.mkdtemp(prefix="stream_hll_", dir=scratch_root())
    src = os.path.join(workdir, "src")
    # two source files x maxFilesPerTrigger=1 -> two micro-batches:
    # the register state provably merges ACROSS batches. Only the two
    # columns the sketch touches are staged and streamed (guide §2.3,
    # r16) — ts/value/props never leave the source table; the register
    # aggregation has no watermark, so no event-time column is needed.
    _t(spark, sf_dir, "events").select("user_id", "event_type").repartition(
        2
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = hll_portable_sketch(stream, "user_id", ["event_type"])
    name = "stream_hll_" + uuid.uuid4().hex[:8]
    # state = |event_type groups| × 512 register cells — width 2 per
    # the state-volume sizing rule (see q_stream_dedup_totals)
    run_stream_to_memory(regs, name, output_mode="complete", state_width=2)
    return hll_portable_estimate(spark.table(name), ["event_type"]).select(
        "event_type", "n_empty", "reg_sum", "est_distinct"
    )


ORACLE_STREAM_HLL_DISTINCT = """
WITH hashed AS MATERIALIZED (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 18, 15))
              AS BIGINT) AS h
  FROM events
),
regs AS MATERIALIZED (
  SELECT event_type, h % 512 AS bucket,
         MAX(CASE WHEN ((h >> 9) & 4294967295) = 0 THEN 33
                  ELSE 33 - length(bin((h >> 9) & 4294967295)) END) AS m_j
  FROM hashed GROUP BY 1, 2
),
agg AS MATERIALIZED (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_set,
         CAST(SUM(1::BIGINT << CAST(40 - m_j AS INTEGER)) AS BIGINT) AS set_sum
  FROM regs GROUP BY 1
),
final AS MATERIALIZED (
  SELECT event_type,
         CAST(512 - n_set AS BIGINT) AS n_empty,
         CAST(set_sum + (512 - n_set) * (1::BIGINT << 40) AS BIGINT) AS reg_sum
  FROM agg
)
SELECT event_type, n_empty, reg_sum,
       ROUND(CASE WHEN CAST(0.7213 AS DOUBLE)
                       / (CAST(1.0 AS DOUBLE)
                          + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE))
                       * CAST(262144 AS DOUBLE) * CAST(1099511627776 AS DOUBLE)
                       / CAST(reg_sum AS DOUBLE) <= CAST(1280 AS DOUBLE)
                   AND n_empty > 0
             THEN CAST(512 AS DOUBLE)
                  * ln(CAST(512 AS DOUBLE) / CAST(n_empty AS DOUBLE))
             ELSE CAST(0.7213 AS DOUBLE)
                  / (CAST(1.0 AS DOUBLE)
                     + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE))
                  * CAST(262144 AS DOUBLE) * CAST(1099511627776 AS DOUBLE)
                  / CAST(reg_sum AS DOUBLE)
        END, 2) AS est_distinct
FROM final
"""


EXTRA_QUERIES.update(
    {
        "stream_hll_distinct": (
            q_stream_hll_distinct,
            ORACLE_STREAM_HLL_DISTINCT,
            "ext:streaming mergeable-HLL distinct (sketch-as-state)",
        ),
    }
)


# --------------------------------------------------------------------------
# Incremental join-view maintenance (operators/scd.py join_agg_deltas)
# --------------------------------------------------------------------------


def q_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregate over a JOIN when BOTH
    sides change (scd.row_deltas + join_agg_deltas + apply_agg_deltas):
    a per-nation revenue view over orders ⋈ customer is maintained
    from signed CDC deltas — orders added/removed/re-priced AND
    customers moving nations — via the exact delta rule
    Δ(R⋈S) = ΔR⋈S_new + R_old⋈ΔS. The maintained view must equal the
    oracle's direct recompute over the new snapshots. Prices are
    cent-quantized so every maintained cell is exact integer algebra.
    At 100 TB: the view update touches |ΔR|⋈S + R⋈|ΔS| + |groups|
    rows; the joined fact table is never rescanned."""
    from yelp_etl_spark.operators.scd import (
        apply_agg_deltas,
        join_agg_deltas,
        row_deltas,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    r_old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bumped = F.when(
        F.col("o_orderstatus") == "O", F.col("o_totalprice") + 1000.0
    ).otherwise(F.col("o_totalprice"))
    r_new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.round(bumped * 100).cast("long").alias("cents"),
    )
    s_old = customer.select("c_custkey", "c_nationkey")
    s_new = customer.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 11 == 0, (F.col("c_nationkey") + 1) % 25
        )
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    base = (
        r_old.join(s_old, "c_custkey")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("sum_cents"))
    )
    dr = row_deltas(r_old, r_new, ["o_orderkey"], ["c_custkey", "cents"])
    ds = row_deltas(s_old, s_new, ["c_custkey"], ["c_nationkey"])
    deltas = join_agg_deltas(
        r_old, dr, s_new, ds, ["c_custkey"], ["c_nationkey"], ["cents"]
    )
    maintained = apply_agg_deltas(
        base,
        deltas,
        ["c_nationkey"],
        count_col="n",
        sum_cols={"cents": "sum_cents"},
    )
    return maintained.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
    ).orderBy("c_nationkey")


ORACLE_INCREMENTAL_JOIN_VIEW = """
WITH r_new AS (
  SELECT o_orderkey, o_custkey AS c_custkey,
         CAST(ROUND((CASE WHEN o_orderstatus = 'O'
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END) * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 5 <> 0
),
s_new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer
)
SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM r_new JOIN s_new USING (c_custkey)
GROUP BY 1 ORDER BY 1
"""


EXTRA_QUERIES.update(
    {
        "incremental_join_view": (
            q_incremental_join_view,
            ORACLE_INCREMENTAL_JOIN_VIEW,
            "ext:join-view IVM (delta rule, both sides changing)",
        ),
    }
)


# --------------------------------------------------------------------------
# CDC changelog apply (plans/pipelines.apply_changelog)
# --------------------------------------------------------------------------


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog ingestion (plans/pipelines.apply_changelog): even
    orders seed a snapshot table; a synthesized CDC batch carries
    updates (every 10th key, seq 2), deletes (every 14th key, seq 3)
    and inserts (odd keys divisible by 9, seq 1) — keys divisible by
    70 get BOTH an update and a delete, and last-writer-wins must let
    the delete (higher seq) prevail. One atomic merge applies the
    fold; the read-back census must equal the oracle's direct
    reconstruction of the final state."""
    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.plans.pipelines import apply_changelog
    from yelp_etl_spark.sources.snapshots import snapshot_read, snapshot_write

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    table = _scratch_dir(sf_dir, "cdc")
    snapshot_write(base, table, mode="replace")
    upd = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("cents") + 12345).alias("cents"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("seq"),
    )
    dele = base.filter(F.col("o_orderkey") % 14 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "cents",
        F.lit("D").alias("op"),
        F.lit(3).cast("long").alias("seq"),
    )
    ins = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 9 == 0)
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "cents",
        F.lit("I").alias("op"),
        F.lit(1).cast("long").alias("seq"),
    )
    apply_changelog(
        spark, upd.unionByName(dele).unionByName(ins), table, ["o_orderkey"]
    )
    final = snapshot_read(spark, table)
    return final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("o_orderstatus") == "X", 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.sum(F.when(F.col("o_orderkey") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
    )


ORACLE_CDC_APPLY = """
WITH src AS MATERIALIZED (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
final AS (
  -- surviving evens: not deleted; every 10th (and not deleted) updated
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0 THEN cents + 12345 ELSE cents END
           AS cents
  FROM src WHERE o_orderkey % 2 = 0 AND o_orderkey % 14 != 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, cents
  FROM src WHERE o_orderkey % 2 = 1 AND o_orderkey % 9 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inserted
FROM final
"""


EXTRA_QUERIES.update(
    {
        "cdc_apply": (
            q_cdc_apply,
            ORACLE_CDC_APPLY,
            "ext:CDC changelog fold (last-writer-wins dedupe + atomic merge)",
        ),
    }
)


# --------------------------------------------------------------------------
# Out-of-order CDC apply (plans/pipelines.apply_changelog_guarded)
# --------------------------------------------------------------------------


def q_cdc_apply_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order CDC convergence (plans/pipelines.
    apply_changelog_guarded): the NEWER batch (seq 5 — deletes every
    14th even key, restates every 20th) is applied FIRST, the STALER
    batch (seq 2 — updates every 10th, inserts odd÷9 keys) second.
    The sequence guard must drop the stale updates wherever a newer
    op landed, and the tombstones must keep the deleted keys deleted
    even though the late batch updates some of them (the resurrection
    trap a physical delete cannot survive). The census over
    read_cdc_table must equal the oracle's direct highest-seq fold."""
    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.plans.pipelines import (
        apply_changelog_guarded,
        read_cdc_table,
    )
    from yelp_etl_spark.sources.snapshots import snapshot_write

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    table = _scratch_dir(sf_dir, "cdcooo")
    snapshot_write(base, table, mode="replace")
    newer = base.filter(F.col("o_orderkey") % 14 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "cents",
        F.lit("D").alias("op"),
        F.lit(5).cast("long").alias("seq"),
    ).unionByName(
        base.filter(
            (F.col("o_orderkey") % 20 == 0) & (F.col("o_orderkey") % 14 != 0)
        ).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("cents") + 500).alias("cents"),
            F.lit("U").alias("op"),
            F.lit(5).cast("long").alias("seq"),
        )
    )
    staler = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("Y").alias("o_orderstatus"),
        (F.col("cents") + 222).alias("cents"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("seq"),
    ).unionByName(
        orders.filter(
            (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 9 == 0)
        ).select(
            "o_orderkey",
            "o_orderstatus",
            "cents",
            F.lit("I").alias("op"),
            F.lit(2).cast("long").alias("seq"),
        )
    )
    apply_changelog_guarded(spark, newer, table, ["o_orderkey"])
    apply_changelog_guarded(spark, staler, table, ["o_orderkey"])
    final = read_cdc_table(spark, table)
    return final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("o_orderstatus") == "X", 1).otherwise(0))
        .cast("long")
        .alias("n_restated"),
        F.sum(F.when(F.col("o_orderstatus") == "Y", 1).otherwise(0))
        .cast("long")
        .alias("n_stale_updates_applied"),
    )


ORACLE_CDC_APPLY_OUT_OF_ORDER = """
WITH src AS MATERIALIZED (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
final AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 20 = 0 THEN 'X'
              WHEN o_orderkey % 10 = 0 THEN 'Y'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 20 = 0 THEN cents + 500
              WHEN o_orderkey % 10 = 0 THEN cents + 222
              ELSE cents END AS cents
  FROM src WHERE o_orderkey % 2 = 0 AND o_orderkey % 14 != 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, cents
  FROM src WHERE o_orderkey % 2 = 1 AND o_orderkey % 9 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_restated,
       CAST(SUM(CASE WHEN o_orderstatus = 'Y' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale_updates_applied
FROM final
"""


EXTRA_QUERIES.update(
    {
        "cdc_apply_out_of_order": (
            q_cdc_apply_out_of_order,
            ORACLE_CDC_APPLY_OUT_OF_ORDER,
            "ext:out-of-order CDC convergence (seq guard + tombstones)",
        ),
    }
)


# --------------------------------------------------------------------------
# Streaming CDC ingestion (readStream → foreachBatch → guarded apply)
# --------------------------------------------------------------------------


def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming lakehouse ingestion end to end: a CDC changelog lands
    as files, Structured Streaming consumes it one file per
    micro-batch (`maxFilesPerTrigger=1`, availableNow), and every
    batch folds into the snapshot table through foreachBatch →
    apply_changelog_guarded. The guard + tombstones make the fold
    BATCH-PARTITION INVARIANT — however the stream happens to split
    the changelog, the table converges to the highest-seq state (the
    property q_cdc_apply_out_of_order pins for explicit reversed
    batches; here the splitting is the stream's own) — which is what
    makes the result deterministic and oracle-checkable at all. The
    oracle reconstructs the fold directly from the base data."""
    import uuid as _uuid

    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.plans.pipelines import (
        apply_changelog_guarded,
        read_cdc_table,
    )
    from yelp_etl_spark.sources.snapshots import snapshot_write

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    table = _scratch_dir(sf_dir, "streamcdc")
    snapshot_write(base, table, mode="replace")
    # the changelog: same op mix as cdc_apply_out_of_order
    changes = (
        base.filter(F.col("o_orderkey") % 14 == 0)
        .select(
            "o_orderkey", "o_orderstatus", "cents",
            F.lit("D").alias("op"), F.lit(5).cast("long").alias("seq"),
        )
        .unionByName(
            base.filter(
                (F.col("o_orderkey") % 20 == 0)
                & (F.col("o_orderkey") % 14 != 0)
            ).select(
                "o_orderkey",
                F.lit("X").alias("o_orderstatus"),
                (F.col("cents") + 500).alias("cents"),
                F.lit("U").alias("op"),
                F.lit(5).cast("long").alias("seq"),
            )
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 10 == 0).select(
                "o_orderkey",
                F.lit("Y").alias("o_orderstatus"),
                (F.col("cents") + 222).alias("cents"),
                F.lit("U").alias("op"),
                F.lit(2).cast("long").alias("seq"),
            )
        )
    )
    feed = _scratch_dir(sf_dir, "streamcdcfeed")
    # 3 files × maxFilesPerTrigger=1 → 3 micro-batches (was 5): each
    # batch pays a full guarded fold — window + target read + merge +
    # snapshot commit — so batch count IS the wall here, and the fold
    # is provably batch-partition invariant (the query's defining
    # property, per the docstring), so the result cannot depend on the
    # split count. 3 keeps the demonstration honest: multiple batches,
    # both seq generations interleaved across them
    # (stream_dedup_totals set the 'enough batches to prove the
    # property, no more' precedent in r10).
    changes.repartition(3).write.parquet(feed)
    ckpt = _scratch_dir(sf_dir, "streamcdcckpt")
    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: apply_changelog_guarded(
                spark, batch, table, ["o_orderkey"]
            )
        )
        .option("checkpointLocation", ckpt)
        .queryName(f"cdc-{_uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = read_cdc_table(spark, table)
    return final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("o_orderstatus") == "X", 1).otherwise(0))
        .cast("long")
        .alias("n_restated"),
        F.sum(F.when(F.col("o_orderstatus") == "Y", 1).otherwise(0))
        .cast("long")
        .alias("n_stale_updates_applied"),
    )


# same fold as the explicit out-of-order query, MINUS the inserts
# (this feed carries only updates/deletes over the base population)
ORACLE_STREAM_CDC_APPLY = """
WITH src AS MATERIALIZED (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
final AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 20 = 0 THEN 'X'
              WHEN o_orderkey % 10 = 0 THEN 'Y'
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 20 = 0 THEN cents + 500
              WHEN o_orderkey % 10 = 0 THEN cents + 222
              ELSE cents END AS cents
  FROM src WHERE o_orderkey % 2 = 0 AND o_orderkey % 14 != 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_restated,
       CAST(SUM(CASE WHEN o_orderstatus = 'Y' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale_updates_applied
FROM final
"""


EXTRA_QUERIES.update(
    {
        "stream_cdc_apply": (
            q_stream_cdc_apply,
            ORACLE_STREAM_CDC_APPLY,
            "ext:streaming CDC ingestion (foreachBatch → guarded fold, split-invariant)",
        ),
    }
)


def q_stream_left_join_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join end to end — the semantics inner
    joins never exercise: an unmatched left row is emitted (with NULL
    right side) only once the GLOBAL watermark proves no future match
    can arrive, i.e. outer results are a state-EVICTION byproduct.
    Clicks join purchases of the same user within the following 30
    minutes; two far-future sentinel rows per side, in separate
    source files after the real data (maxFilesPerTrigger=1 →
    deterministic file-per-batch phases, file order pinned by explicit
    mtimes), march the watermark past every real row's join horizon so
    the availableNow run flushes ALL real unmatched clicks — without
    the second sentinel batch the final expirations would sit in state
    forever (watermark computed at batch N applies at batch N+1).
    Sentinels filter out by key sign. The oracle is the plain batch
    left join. State at 100 TB stays O(key-rate × (watermark+window))
    — exactly the bound the join condition declares."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.streaming.windows import stream_stream_join

    cols = ["user_id", "ts", "event_id", "value"]
    # materialize the two tiny event slices once: every staging write
    # below otherwise re-scans the source, and the single-file writes
    # must not single-thread that scan (repartition(1), never
    # coalesce(1) — coalesce collapses the SCAN to one task too)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", *cols)
        .localCheckpoint(eager=True)
    )
    clicks = ev.filter(F.col("event_type") == "click").select(cols)
    purchases = ev.filter(F.col("event_type") == "purchase").select(cols)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def stage(df, phase: int, root: str):
        tmp = root + f"_tmp{phase}"
        df.repartition(1).write.parquet(tmp)
        part = [f for f in _os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = _os.path.join(root, f"{phase:02d}.parquet")
        _shutil.move(_os.path.join(tmp, part), dst)
        _shutil.rmtree(tmp, ignore_errors=True)
        base = 1_700_000_000 + phase * 60  # strictly increasing mtimes:
        _os.utime(dst, (base, base))      # the source lists by (mtime, path)

    l_src = _scratch_dir(sf_dir, "sljl")
    r_src = _scratch_dir(sf_dir, "sljr")
    _os.makedirs(l_src), _os.makedirs(r_src)
    stage(clicks, 0, l_src)
    stage(purchases, 0, r_src)
    for phase, days in ((1, 100), (2, 200)):
        _stage_sentinel_file(l_src, phase, max_ts, -1, days)
        _stage_sentinel_file(r_src, phase, max_ts, -2, days)
    schema = clicks.schema
    l_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(l_src)
    )
    r_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(r_src)
    )
    joined = stream_stream_join(
        l_stream, r_stream, watermark="1 hour", within="30 minutes",
        how="left_outer",
    )
    name = "slj_" + _uuid.uuid4().hex[:8]
    ckpt = _scratch_dir(sf_dir, "sljckpt")
    # state-store width sized to state volume + no-data finalization
    # batch disabled (both sentinel batches already flush every real
    # row; the empty batch only paid one more state-commit round per
    # store) — see streaming/windows.stream_run_conf: 32-wide state
    # schedules 32 state tasks per micro-batch per stateful operator
    # for nothing (r15 re-sized 8 → 2: a stream-stream join keeps FOUR
    # state stores per partition; measured 18-21 s at 8 vs 8.6 s at 2),
    # and the r16 noData A/B read −17% wall with identical rows.
    from yelp_etl_spark.streaming.windows import stream_run_conf

    with stream_run_conf(spark, state_width=2):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).filter(F.col("l_key") >= 0)
    return out.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("r_event_id").isNotNull().cast("long"))
        .cast("long")
        .alias("n_matched"),
        F.sum(F.col("r_event_id").isNull().cast("long"))
        .cast("long")
        .alias("n_unmatched"),
        F.countDistinct(
            F.when(F.col("r_event_id").isNull(), F.col("l_event_id"))
        ).cast("long").alias("unmatched_clicks"),
        F.round(F.sum(F.coalesce("r_value", F.lit(0.0))), 2).alias(
            "matched_value"
        ),
    )


ORACLE_STREAM_LEFT_JOIN_EXPIRY = """
WITH l AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
         r.value AS r_value
  FROM l LEFT JOIN r
    ON l.user_id = r.user_id
   AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN r_event_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched,
       CAST(SUM(CASE WHEN r_event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(COUNT(DISTINCT CASE WHEN r_event_id IS NULL THEN l_event_id END)
            AS BIGINT) AS unmatched_clicks,
       ROUND(SUM(COALESCE(r_value, 0.0)), 2) AS matched_value
FROM j
"""


EXTRA_QUERIES.update(
    {
        "stream_left_join_expiry": (
            q_stream_left_join_expiry,
            ORACLE_STREAM_LEFT_JOIN_EXPIRY,
            "ext:stream-stream left-outer join (watermark state eviction)",
        ),
    }
)


def q_stream_full_join_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join end to end — the last
    watermark-eviction semantics row after r8's left-outer: unmatched
    rows from BOTH sides are emitted (NULL other side) only once the
    global watermark proves no future match can arrive, so both
    buffers' evictions become visible output. Same harness discipline
    as stream_left_join_expiry (q.v.): clicks ⟗ purchases of the same
    user within the following 30 minutes; two far-future sentinel rows
    per side in separate mtime-pinned files (maxFilesPerTrigger=1 →
    deterministic file-per-batch phases) march the watermark past
    every real row's horizon so the availableNow run flushes ALL real
    unmatched rows on both sides (watermark computed at batch N
    applies at N+1 — one trailing batch leaves the final evictions
    stuck in state). Sentinels filter by key sign on COALESCE(l_key,
    r_key) — a right-unmatched row has NULL l_key. Oracle = the plain
    batch full join. State at 100 TB stays O(key-rate ×
    (watermark+window)) per side — the bound the join condition
    declares."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.streaming.windows import stream_stream_join

    cols = ["user_id", "ts", "event_id", "value"]
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", *cols)
        .localCheckpoint(eager=True)
    )
    clicks = ev.filter(F.col("event_type") == "click").select(cols)
    purchases = ev.filter(F.col("event_type") == "purchase").select(cols)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def stage(df, phase: int, root: str):
        tmp = root + f"_tmp{phase}"
        df.repartition(1).write.parquet(tmp)
        part = [f for f in _os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = _os.path.join(root, f"{phase:02d}.parquet")
        _shutil.move(_os.path.join(tmp, part), dst)
        _shutil.rmtree(tmp, ignore_errors=True)
        base = 1_700_000_000 + phase * 60
        _os.utime(dst, (base, base))

    l_src = _scratch_dir(sf_dir, "sfjl")
    r_src = _scratch_dir(sf_dir, "sfjr")
    _os.makedirs(l_src), _os.makedirs(r_src)
    stage(clicks, 0, l_src)
    stage(purchases, 0, r_src)
    for phase, days in ((1, 100), (2, 200)):
        _stage_sentinel_file(l_src, phase, max_ts, -1, days)
        _stage_sentinel_file(r_src, phase, max_ts, -2, days)
    schema = clicks.schema
    l_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(l_src)
    )
    r_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(r_src)
    )
    joined = stream_stream_join(
        l_stream, r_stream, watermark="1 hour", within="30 minutes",
        how="full_outer",
    )
    name = "sfj_" + _uuid.uuid4().hex[:8]
    ckpt = _scratch_dir(sf_dir, "sfjckpt")
    # width-2 state + no-data finalization batch disabled (r16 A/B:
    # −19% wall, identical rows) — streaming/windows.stream_run_conf
    from yelp_etl_spark.streaming.windows import stream_run_conf

    with stream_run_conf(spark, state_width=2):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).filter(
        F.coalesce(F.col("l_key"), F.col("r_key")) >= 0
    )
    return out.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            (F.col("l_event_id").isNotNull()
             & F.col("r_event_id").isNotNull()).cast("long")
        ).cast("long").alias("n_matched"),
        F.sum(F.col("r_event_id").isNull().cast("long"))
        .cast("long").alias("n_left_unmatched"),
        F.sum(F.col("l_event_id").isNull().cast("long"))
        .cast("long").alias("n_right_unmatched"),
        F.countDistinct(
            F.when(F.col("r_event_id").isNull(), F.col("l_event_id"))
        ).cast("long").alias("unmatched_clicks"),
        F.countDistinct(
            F.when(F.col("l_event_id").isNull(), F.col("r_event_id"))
        ).cast("long").alias("unmatched_purchases"),
        F.round(F.sum(F.coalesce("r_value", F.lit(0.0))), 2).alias(
            "joined_value"
        ),
    )


ORACLE_STREAM_FULL_JOIN_EXPIRY = """
WITH l AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'),
j AS (
  SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
         r.value AS r_value
  FROM l FULL JOIN r
    ON l.user_id = r.user_id
   AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_event_id IS NOT NULL AND r_event_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN r_event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_left_unmatched,
       CAST(SUM(CASE WHEN l_event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_right_unmatched,
       CAST(COUNT(DISTINCT CASE WHEN r_event_id IS NULL THEN l_event_id END)
            AS BIGINT) AS unmatched_clicks,
       CAST(COUNT(DISTINCT CASE WHEN l_event_id IS NULL THEN r_event_id END)
            AS BIGINT) AS unmatched_purchases,
       ROUND(SUM(COALESCE(r_value, 0.0)), 2) AS joined_value
FROM j
"""


EXTRA_QUERIES.update(
    {
        "stream_full_join_expiry": (
            q_stream_full_join_expiry,
            ORACLE_STREAM_FULL_JOIN_EXPIRY,
            "ext:stream-stream full-outer join (both-side state eviction)",
        ),
    }
)


def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark end to end (Spark 3.5's
    bounded-state streaming dedup — the §2.10e row plain
    dropDuplicates can't give you at 100 TB/day: its state never
    evicts, this one's does): duplicates of a key are suppressed only
    while the key's state lives (event time + delay), and the SAME key
    re-emits after the watermark evicts it — at-least-once dedup with
    O(active-keys) state instead of O(all-keys-ever). Deterministic
    phases (mtime-pinned files, maxFilesPerTrigger=1): batch 0 = all
    real click events (same-key duplicates collapse in-batch); batch 1
    = a far-future watermark advancer (evicts every batch-0 key);
    batch 2 = REPLAYS of 20 batch-0 keys shifted far ahead — all 20
    re-emit because their state is gone. The oracle is the exact
    emission law: distinct keys from phase 0 + all phase-2 rows,
    distinguished by the time cutoff."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from yelp_etl_spark.plans.catalog import _scratch_dir

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id")
        .localCheckpoint(eager=True)
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    replay = (
        ev.select("user_id").distinct()
        .orderBy("user_id")
        .limit(20)
        .select(
            "user_id",
            (F.lit(max_ts) + F.expr("INTERVAL 400 DAYS")).alias("ts"),
            F.lit(-9).cast("long").alias("event_id"),
        )
    )
    def advancer(days: int):
        return spark.createDataFrame(
            [(-1, max_ts, -1)], "user_id long, ts timestamp, event_id long"
        ).select(
            "user_id",
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            "event_id",
        )

    def stage(df, phase: int, root: str):
        tmp = root + f"_tmp{phase}"
        df.repartition(1).write.parquet(tmp)
        part = [f for f in _os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = _os.path.join(root, f"{phase:02d}.parquet")
        _shutil.move(_os.path.join(tmp, part), dst)
        _shutil.rmtree(tmp, ignore_errors=True)
        base = 1_700_000_000 + phase * 60
        _os.utime(dst, (base, base))

    src = _scratch_dir(sf_dir, "sddw")
    _os.makedirs(src)
    stage(ev, 0, src)
    # TWO advancer batches, not one: dropDuplicatesWithinWatermark's
    # store lookup drops a duplicate WITHOUT an expiry check, and
    # eviction runs at END of batch using the PREVIOUS batch's
    # watermark — so after one advancer the replay's lookups would
    # still see any batch-0 key whose stored event sits within
    # 2×delay of max_ts (r9 review: red on a ts-unsorted fixture).
    # The second advancer guarantees every batch-0 key is evicted
    # BEFORE the replay batch is processed.
    stage(advancer(200), 1, src)
    stage(advancer(250), 2, src)
    stage(replay, 3, src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    name = "sddw_" + _uuid.uuid4().hex[:8]
    ckpt = _scratch_dir(sf_dir, "sddwckpt")
    # width-2 state + no-data finalization batch disabled (r16 A/B:
    # −13% wall, identical rows) — streaming/windows.stream_run_conf
    from yelp_etl_spark.streaming.windows import stream_run_conf

    with stream_run_conf(spark, state_width=2):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).filter(F.col("user_id") >= 0)
    cutoff = F.lit(max_ts) + F.expr("INTERVAL 300 DAYS")
    return out.agg(
        F.sum((F.col("ts") < cutoff).cast("long")).cast("long")
        .alias("emitted_phase0"),
        F.sum((F.col("ts") >= cutoff).cast("long")).cast("long")
        .alias("re_emitted_after_eviction"),
        F.countDistinct("user_id").cast("long").alias("distinct_users"),
    )


ORACLE_STREAM_DEDUP_WITHIN_WATERMARK = """
WITH clicks AS MATERIALIZED (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM clicks)
         AS emitted_phase0,
       (SELECT CAST(LEAST(20, COUNT(DISTINCT user_id)) AS BIGINT)
        FROM clicks) AS re_emitted_after_eviction,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM clicks)
         AS distinct_users
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the 1995 daily
    revenue series (moving-average STL-lite: trend = centered 7-day
    mean, seasonal = per-weekday mean of the detrended series,
    remainder = what's left) — the EXPLAIN step beside the forecast
    rows (holt/seasonal-naive predict; this attributes). ZERO interior
    divisions on either engine (DuckDB's decimal '/' silently returns
    DOUBLE — exact only below 2^53, a silent sf30+ divergence; r9
    review): the detrended series is carried at 7×micro scale
    (detr7 = 7·10^6·y − (10^6·sum7 − 10^6·sum7 % 7)), the per-weekday
    seasonal index as its exactly-divisible numerator
    (Σdetr7 − Σdetr7 % n), and the remainder pre-multiplied by the
    weekday count (n·detr7 − seasonal_num) — all IDENTICAL
    decimal(38,0) integers emitted as strings, plus one rounded
    double (seasonal_cents) divided from those identical integers for
    human reading. Scale: one map-side-combinable groupBy to ≤365 day
    rows; windows over that bounded frame."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = days.select(
        "d",
        "y",
        F.count("*").over(w7).alias("w_n"),
        F.sum("y").over(w7).alias("w_sum"),
    ).filter(F.col("w_n") == 7)
    detr = trended.select(
        "d",
        F.dayofweek("d").cast("long").alias("dow"),
        F.expr(
            "CAST(CAST(7000000 AS DECIMAL(38,0)) * y"
            " - (CAST(1000000 AS DECIMAL(38,0)) * w_sum"
            "    - (CAST(1000000 AS DECIMAL(38,0)) * w_sum) % 7)"
            " AS DECIMAL(38,0))"
        ).alias("detr7"),
    )
    seas = detr.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr(
            "CAST(SUM(detr7) - SUM(detr7) % COUNT(*) AS DECIMAL(38,0))"
        ).alias("seasonal_num"),
    )
    rem = (
        detr.join(seas, "dow")
        .groupBy("dow")
        .agg(
            F.max(
                F.abs(
                    F.col("n_days").cast("decimal(38,0)") * F.col("detr7")
                    - F.col("seasonal_num")
                )
            ).cast("decimal(38,0)").alias("max_abs_rem"),
        )
    )
    return (
        seas.join(rem, "dow")
        .select(
            "dow",
            "n_days",
            F.col("seasonal_num").cast("string").alias("seasonal_num_7micro"),
            F.col("max_abs_rem").cast("string")
            .alias("max_abs_remainder_x7n_micro"),
            F.round(
                F.col("seasonal_num").cast("double")
                / (F.lit(7_000_000.0) * F.col("n_days").cast("double")),
                4,
            ).alias("seasonal_cents"),
        )
        .orderBy("dow")
    )


ORACLE_SEASONAL_DECOMPOSE = """
WITH days AS MATERIALIZED (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
trended AS MATERIALIZED (
  SELECT d, y,
         COUNT(*) OVER w AS w_n,
         SUM(y) OVER w AS w_sum
  FROM days WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS MATERIALIZED (
  SELECT d,
         CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
         CAST(CAST(7000000 AS DECIMAL(38,0)) * y
              - (CAST(1000000 AS DECIMAL(38,0)) * w_sum
                 - (CAST(1000000 AS DECIMAL(38,0)) * w_sum) % 7)
              AS DECIMAL(38,0)) AS detr7
  FROM trended WHERE w_n = 7
),
seas AS MATERIALIZED (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(detr7) - SUM(detr7) % COUNT(*) AS DECIMAL(38,0))
           AS seasonal_num
  FROM detr GROUP BY 1
)
SELECT seas.dow AS dow, n_days,
       CAST(seasonal_num AS VARCHAR) AS seasonal_num_7micro,
       CAST(MAX(abs(CAST(n_days AS DECIMAL(38,0)) * detr7 - seasonal_num))
            AS VARCHAR) AS max_abs_remainder_x7n_micro,
       ROUND(CAST(seasonal_num AS DOUBLE)
             / (7000000.0 * CAST(n_days AS DOUBLE)), 4) AS seasonal_cents
FROM detr JOIN seas ON detr.dow = seas.dow
GROUP BY 1, 2, 3, 5 ORDER BY 1
"""


EXTRA_QUERIES.update(
    {
        "stream_dedup_within_watermark": (
            q_stream_dedup_within_watermark,
            ORACLE_STREAM_DEDUP_WITHIN_WATERMARK,
            "ext:dropDuplicatesWithinWatermark (bounded-state dedup"
            " + post-eviction re-emit)",
        ),
        "seasonal_decompose": (
            q_seasonal_decompose,
            ORACLE_SEASONAL_DECOMPOSE,
            "ext:additive seasonal decomposition (exact micro trend/"
            "seasonal/remainder)",
        ),
    }
)


def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregations in a REAL streaming run (Spark
    3.4's window_time: a second window aggregation directly over the
    first's window column — the two-tier rollup every metrics pipeline
    wants without a second job): 5-minute tumbling counts per event
    type re-aggregate into 30-minute windows inside ONE streaming
    query, append mode, watermark-gated. Deterministic phases via
    mtime-pinned files (the stream_dedup_within_watermark rig): batch
    0 = all real events; batches 1-2 = far-future sentinel rows that
    push the watermark past every real window so append mode flushes
    them all (two, because eviction uses the PREVIOUS batch's
    watermark). The oracle computes the same 30-minute rollup in
    batch SQL — equality holds precisely because the sentinels
    finalized every real window. State scale: O(open windows ×
    types) per tier, both evicted by the same watermark."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from yelp_etl_spark.plans.catalog import _scratch_dir

    ev = (
        _t(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .localCheckpoint(eager=True)
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def sentinel(days: int):
        return spark.createDataFrame(
            [(max_ts, "zz_sentinel", 0.0)],
            "ts timestamp, event_type string, value double",
        ).select(
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            "event_type",
            "value",
        )

    def stage(df, phase: int, root: str):
        tmp = root + f"_tmp{phase}"
        df.repartition(1).write.parquet(tmp)
        part = [f for f in _os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = _os.path.join(root, f"{phase:02d}.parquet")
        _shutil.move(_os.path.join(tmp, part), dst)
        _shutil.rmtree(tmp, ignore_errors=True)
        base = 1_700_000_000 + phase * 60
        _os.utime(dst, (base, base))

    src = _scratch_dir(sf_dir, "chainw")
    _os.makedirs(src)
    stage(ev, 0, src)
    stage(sentinel(200), 1, src)
    stage(sentinel(250), 2, src)
    tier1 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(
            F.count("*").alias("n5"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c5"),
        )
    )
    chained = (
        tier1.groupBy(
            F.window(F.window_time("window"), "30 minutes").alias("w30"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n5").alias("n_events"),
            F.sum("c5").alias("sum_value_cents"),
            F.count("*").alias("n_subwindows"),
        )
    )
    name = "chainw_" + _uuid.uuid4().hex[:8]
    ckpt = _scratch_dir(sf_dir, "chainwckpt")
    # width-2 state + no-data finalization batch disabled (r16 A/B:
    # −12% wall, identical rows) — streaming/windows.stream_run_conf
    from yelp_etl_spark.streaming.windows import stream_run_conf

    with stream_run_conf(spark, state_width=2):
        q = (
            chained.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).filter(F.col("event_type") != "zz_sentinel")
    return out.select(
        F.col("w30.start").cast("string").alias("window_start"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value_cents").cast("long").alias("sum_value_cents"),
        F.col("n_subwindows").cast("long").alias("n_subwindows"),
    ).orderBy("window_start", "event_type")


ORACLE_STREAM_CHAINED_WINDOWS = """
WITH t5 AS MATERIALIZED (
  SELECT to_timestamp(FLOOR(epoch(ts) / 300) * 300) AS w5,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n5,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c5
  FROM events GROUP BY 1, 2
)
SELECT CAST(CAST(to_timestamp(FLOOR(epoch(w5) / 1800) * 1800)
                 AS TIMESTAMP) AS VARCHAR) AS window_start,
       event_type,
       CAST(SUM(n5) AS BIGINT) AS n_events,
       CAST(SUM(c5) AS BIGINT) AS sum_value_cents,
       CAST(COUNT(*) AS BIGINT) AS n_subwindows
FROM t5 GROUP BY 1, 2 ORDER BY 1, 2
"""


EXTRA_QUERIES.update(
    {
        "stream_chained_windows": (
            q_stream_chained_windows,
            ORACLE_STREAM_CHAINED_WINDOWS,
            "ext:chained streaming window aggregations (window_time"
            " two-tier rollup, sentinel-flushed append)",
        ),
    }
)
