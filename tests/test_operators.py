"""Unit tests for the cleaning/wrangling operators (SURVEY.md §5.2):
flatten, safe-cast, explode, date features, nullish normalization,
enrich prefixing — each on tiny in-memory DataFrames pinning the
reference's behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from yelp_etl_spark.operators import (
    add_date_features,
    enrich,
    explode_delimited,
    flatten_structs,
    normalize_nullish_strings,
    prefix_columns,
    safe_cast,
)
from yelp_etl_spark.operators.enrich import Dimension


def test_flatten_structs_recursive(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2, "b": {"c": "x"}})],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "s",
                    T.StructType(
                        [
                            T.StructField("a", T.LongType()),
                            T.StructField(
                                "b",
                                T.StructType([T.StructField("c", T.StringType())]),
                            ),
                        ]
                    ),
                ),
            ]
        ),
    )
    flat = flatten_structs(df)
    assert flat.columns == ["id", "s_a", "s_b_c"]
    row = flat.collect()[0]
    assert (row.id, row.s_a, row.s_b_c) == (1, 2, "x")


def test_flatten_structs_only_selected(spark):
    df = spark.createDataFrame([((1,), (2,))], "s1 struct<a:int>, s2 struct<b:int>")
    flat = flatten_structs(df, only={"s1"})
    assert flat.columns == ["s1_a", "s2"]


def test_safe_cast_accepts_only_lossless(spark):
    # 'maybe_bool' casts cleanly; 'not_bool' would create a new NULL → kept.
    df = spark.createDataFrame(
        [("true", "true"), ("false", "banana"), (None, None)],
        "maybe_bool string, not_bool string",
    )
    out = safe_cast(
        df,
        {
            "maybe_bool": [T.BooleanType()],
            "not_bool": [T.BooleanType()],
        },
    )
    types = dict(out.dtypes)
    assert types["maybe_bool"] == "boolean"
    assert types["not_bool"] == "string"


def test_safe_cast_candidate_order(spark):
    # map<string,boolean> fails (values aren't booleans), map<string,string> wins
    df = spark.createDataFrame([('{"a": "x"}',)], "m string")
    out = safe_cast(
        df,
        {
            "m": [
                T.MapType(T.StringType(), T.BooleanType()),
                T.MapType(T.StringType(), T.StringType()),
            ]
        },
    )
    assert dict(out.dtypes)["m"] == "map<string,string>"
    assert out.collect()[0].m == {"a": "x"}


def test_normalize_nullish_strings(spark):
    df = spark.createDataFrame(
        [("u'free'",), ("None",), ("none",), ("True",), ("{'a': True, 'b': u'x'}",)],
        "v string",
    )
    out = normalize_nullish_strings(df, ["v"]).collect()
    values = [r.v for r in out]
    assert values[0] == "free"
    assert values[1] is None
    assert values[2] is None
    assert values[3] == "true"
    assert values[4] == "{'a': true, 'b': 'x'}"


def test_explode_delimited_checkin_shape(spark):
    # reference clean.py:54-57: comma-separated timestamps → rows + id
    df = spark.createDataFrame(
        [("b1", "2020-01-01 00:00:00, 2020-01-02 00:00:00"), ("b2", "2020-03-01 12:00:00")],
        "business_id string, date string",
    )
    out = explode_delimited(
        df, "date", ", ", id_column="checkin_id", key_columns=["business_id"]
    )
    rows = out.collect()
    assert len(rows) == 3
    assert len({r.checkin_id for r in rows}) == 3  # unique surrogate keys
    # deterministic: same input → same ids
    again = explode_delimited(
        df.repartition(4), "date", ", ", id_column="checkin_id", key_columns=["business_id"]
    ).collect()
    assert {r.checkin_id for r in rows} == {r.checkin_id for r in again}


def test_add_date_features(spark):
    df = spark.createDataFrame([("2018-07-04",)], "date string")
    out = add_date_features(df, "date", "yyyy-MM-dd")
    row = out.collect()[0]
    assert str(row.date_date) == "2018-07-04"
    assert str(row.date_week_start_date) == "2018-07-02"  # Monday
    assert row.date_week == 27
    assert row.date_quarter == 3
    assert row.date_dayofweek == 4  # Wednesday, Sun=1 convention
    assert row.date_month == 7
    assert row.date_year == 2018
    assert "date" not in out.columns


def test_enrich_prefixes_and_inner_semantics(spark):
    fact = spark.createDataFrame(
        [(1, "k1", 10.0), (2, "k2", 20.0), (3, "orphan", 30.0)],
        "fact_id long, business_id string, stars double",
    )
    dim = spark.createDataFrame(
        [("k1", "A", 4.5), ("k2", "B", 3.0)], "business_id string, name string, stars double"
    )
    out = enrich(fact, [Dimension("business", dim, "business_id")])
    assert sorted(out.columns) == sorted(
        ["fact_id", "business_id", "stars", "business_name", "business_stars"]
    )
    assert out.count() == 2  # inner join drops the orphan


def test_prefix_columns_exclude(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    out = prefix_columns(df, "dim", exclude={"id"})
    assert out.columns == ["id", "dim_v"]
