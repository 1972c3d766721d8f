"""Format-dispatch roundtrips: write_table/read_files across
parquet/orc/csv/json, with identity partitions surviving the trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_etl_spark.sources.readers import load_table, read_files
from yelp_etl_spark.sources.writers import WriteSpec, write_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_formats(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "nation")
    target = str(tmp_path / f"nation_{fmt}")
    write_table(src, target, WriteSpec(format=fmt))
    back = read_files(spark, target, format=fmt, schema=src.schema)
    assert back.count() == src.count()
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_partitioned_write_survives_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    target = str(tmp_path / "orders_by_year")
    write_table(src, target, WriteSpec(format="orc", partition_columns=["order_year"]))
    back = read_files(spark, target, format="orc")
    assert back.count() == src.count()
    # partition pruning works on the directory layout
    one_year = back.filter(F.col("order_year") == 1996)
    assert one_year.count() == src.filter(F.col("order_year") == 1996).count()


def test_zorder_layout_prunes_files(spark, sf_dir, tmp_path):
    """Z-order clustering must shrink per-file key ranges enough that a
    point probe on EITHER clustered column touches strictly fewer files
    than the unclustered layout (which matches every file)."""
    from yelp_etl_spark.sources.layout import (
        file_stats,
        files_matching_point,
        write_zordered,
    )
    from yelp_etl_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zord")
    li.repartition(8).write.mode("overwrite").parquet(plain_dir)
    write_zordered(li, z_dir, ["l_partkey", "l_suppkey"], num_files=8)

    plain = file_stats(spark, plain_dir, ["l_partkey", "l_suppkey"])
    zord = file_stats(spark, z_dir, ["l_partkey", "l_suppkey"])
    assert zord.count() == 8
    # same rows, different layout
    n_plain = sum(r.n_rows for r in plain.collect())
    n_z = sum(r.n_rows for r in zord.collect())
    assert n_plain == n_z == li.count()
    # hash layout scatters ranges -> every file matches a point probe
    assert files_matching_point(plain, "l_partkey", 57) == 8
    # z-order localizes BOTH dimensions
    assert files_matching_point(zord, "l_partkey", 57) <= 4
    assert files_matching_point(zord, "l_suppkey", 3) <= 6


def test_events_ntz_cast_requires_utc_session(spark, sf_dir):
    """The timestamp_ntz->timestamp normalization in load_table is only
    value-preserving under a UTC session zone; a non-UTC session must
    fail loudly instead of silently epoch-shifting every downstream
    time function (ADVICE round 1)."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"
    try:
        # every fixed-UTC alias is fine — the driver's vanilla session
        # reports the JVM default, e.g. 'Etc/UTC'
        for alias in ("Etc/UTC", "GMT", "Z"):
            spark.conf.set("spark.sql.session.timeZone", alias)
            load_table(spark, sf_dir, "events")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="UTC-equivalent"):
            load_table(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, sf_dir, tmp_path
):
    from yelp_etl_spark.sources.writers import overwrite_partitions_dynamic

    target = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    overwrite_partitions_dynamic(orders, target, ["o_orderstatus"])
    before = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(before) >= 2

    # rewrite ONE partition with a single row; others must be untouched
    some_status = sorted(before)[0]
    one = orders.filter(F.col("o_orderstatus") == some_status).limit(1)
    overwrite_partitions_dynamic(one, target, ["o_orderstatus"])
    after = {
        r.o_orderstatus: r.n
        for r in spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert after[some_status] == 1
    for status, n in before.items():
        if status != some_status:
            assert after[status] == n  # untouched partitions intact


def test_fan_out_widens_narrow_scans_only(spark, sf_dir):
    """fan_out repartitions a narrow plan up to defaultParallelism and
    is a NO-OP (same DataFrame object, no added Exchange) when the
    plan already has at least that many partitions — the guarantee
    that makes it safe to leave in operators at 100 TB, where scans
    always carry more splits than cores."""
    from yelp_etl_spark.sources.readers import fan_out, load_table

    target = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < target  # single-file fixture
    widened = fan_out(docs, "doc_id")
    assert widened.rdd.getNumPartitions() == target
    # values unchanged, only layout
    assert widened.count() == docs.count()
    already_wide = docs.repartition(target * 2)
    assert fan_out(already_wide, "doc_id") is already_wide


def test_read_json_permissive_corrupt_record_capture(spark, tmp_path):
    """S1 robustness: malformed JSON lines must not kill a 100 TB scan.
    PERMISSIVE mode with an explicit schema + _corrupt_record column
    captures bad lines for quarantine while good rows flow through."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from yelp_etl_spark.sources.readers import read_json

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_json(spark, str(p), schema=schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.id for r in good.collect()} == {1, 3}
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]._corrupt_record
    df.unpersist()


def test_read_csv_permissive_quarantine_boundary(spark, tmp_path):
    """S1b: CSV's PERMISSIVE quarantine boundary, pinned empirically.
    Cast failures are ALWAYS flagged in _corrupt_record. Schema-shape
    mismatches (short rows, surplus tokens) are flagged ONLY when the
    plan reads every schema column — under CSV column pruning
    (spark.sql.csv.parser.columnPruning.enabled, default true) a
    projection that drops any data column also silently un-flags
    shape-corrupt rows, and their best-effort values (nulls for
    missing fields, surplus dropped) flow through as good. A 100 TB
    quarantine pipeline must therefore either read full-width or add
    downstream NULL checks — this is exactly why csv_scan_roundtrip's
    injected lines are both cast failures."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from yelp_etl_spark.sources.readers import read_files

    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,name,n\n"
        "1,ok,10\n"
        "notalong,bad,notanint\n"  # cast failure -> always flagged
        "3,short\n"  # short row -> flagged only full-width
        "4,long,40,surplus\n"  # extra token -> flagged only full-width
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("n", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_files(
        spark,
        str(p),
        format="csv",
        schema=schema,
        header="true",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    # Full-width scan: every malformed row flagged, values best-effort.
    full = {r.id: r for r in df.collect()}
    assert full[None]._corrupt_record is not None  # cast failure
    assert full[3]._corrupt_record is not None and full[3].n is None
    assert full[4]._corrupt_record is not None and full[4].n == 40
    assert full[1]._corrupt_record is None
    # Pruned scan (name column dropped): ONLY the cast failure stays
    # flagged; shape mismatches silently pass as good. (No cache above:
    # a cached full-width parse would serve this select and hide the
    # pruned-parse behavior.)
    pruned = {r.id: r for r in df.select("id", "_corrupt_record").collect()}
    assert pruned[None]._corrupt_record is not None
    assert pruned[3]._corrupt_record is None
    assert pruned[4]._corrupt_record is None


def test_snapshot_expire_vacuum_lifecycle_query(spark, sf_dir):
    """snapshot_expire catalog query end-to-end at sf0.001: pins the
    full retention contract in one row (2 expired, 1 snapshot left,
    orphans reclaimed, expired time travel fails)."""
    from yelp_etl_spark.plans.catalog import QUERIES

    row = QUERIES["snapshot_expire"].fn(spark, sf_dir).collect()[0]
    assert row.n_expired == 2
    assert row.n_snapshots_left == 1
    assert row.vacuumed_any == 1
    assert row.tt_gone == 1
    assert row.n > 0


def test_distributed_write_bounds_file_count(spark, sf_dir, tmp_path):
    """WriteSpec(distribute=True) hash-distributes rows to the layout
    keys before the path write (Iceberg write.distribution-mode=hash):
    file count is bounded by #(partition, bucket) combos, not by
    write-tasks × directories. Without it a 32-task write scatters
    files into every directory it touches."""
    import os

    from yelp_etl_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").repartition(16)
    spec = dict(
        partition_columns=["o_orderstatus"],
        bucket_column="o_custkey",
        buckets=4,
    )

    def n_files(path):
        return sum(
            1
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    scattered = str(tmp_path / "scattered")
    write_table(orders, scattered, WriteSpec(**spec))
    distributed = str(tmp_path / "distributed")
    write_table(orders, distributed, WriteSpec(**spec, distribute=True))

    combos = 3 * 4  # statuses x buckets
    assert n_files(distributed) <= combos
    assert n_files(scattered) > n_files(distributed)
    # identical content either way
    a = spark.read.parquet(scattered).count()
    b = spark.read.parquet(distributed).count()
    assert a == b == orders.count()


def test_zstd_write_smaller_than_snappy(spark, sf_dir, tmp_path):
    """Codec choice is a WriteSpec option pass-through: zstd trades a
    little CPU for materially smaller files than the snappy default —
    at 100 TB that ratio is the storage bill and the scan bytes. Both
    roundtrip losslessly."""
    import os

    from yelp_etl_spark.sources.readers import load_table

    lineitem = load_table(spark, sf_dir, "lineitem").limit(20000)
    n = lineitem.count()

    def size(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )

    snappy = str(tmp_path / "snappy")
    zstd = str(tmp_path / "zstd")
    write_table(lineitem, snappy, WriteSpec(options={"compression": "snappy"}))
    write_table(lineitem, zstd, WriteSpec(options={"compression": "zstd"}))
    assert size(zstd) < size(snappy)
    assert spark.read.parquet(zstd).count() == spark.read.parquet(snappy).count() == n
