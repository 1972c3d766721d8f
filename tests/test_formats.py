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
