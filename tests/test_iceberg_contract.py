"""Writer-spec contract for the Iceberg sink branch (VERDICT r2, task 5).

The sandbox has no Iceberg runtime jars, so ``tests/test_iceberg.py``
(the real end-to-end) is skip-marked. This module closes the coverage
gap without jars: it intercepts ``DataFrame.writeTo`` with a recording
fake and asserts that ``write_table`` issues EXACTLY the
DataFrameWriterV2 call sequence the reference issues
(reference write.py:24-53):

    df.writeTo(target).using("iceberg")
      .partitionedBy(identity..., bucket(N, col))
      .createOrReplace()

The fake never touches a catalog, so this runs anywhere; when jars are
present, test_iceberg.py proves the same spec against a real Hadoop
catalog. Together they pin S4 (create-or-replace), S5 (identity
partition) and S6 (hidden bucket transform).
"""

from __future__ import annotations

from yelp_etl_spark.sources.readers import load_table
from yelp_etl_spark.sources.writers import WriteSpec, write_table


class _RecordingWriterV2:
    """Duck-typed stand-in for DataFrameWriterV2 that records the call
    chain instead of executing it."""

    def __init__(self, target: str, calls: list):
        self._target = target
        self._calls = calls
        calls.append(("writeTo", target))

    def using(self, fmt):
        self._calls.append(("using", fmt))
        return self

    def option(self, k, v):
        self._calls.append(("option", k, v))
        return self

    def partitionedBy(self, *cols):
        # Column reprs are the public, stable way to inspect transform
        # expressions without a catalog: Column<'bucket(4, o_custkey)'>.
        self._calls.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self._calls.append(("createOrReplace",))

    def append(self):
        self._calls.append(("append",))


def _capture_write(monkeypatch, df, target, spec):
    calls: list = []
    # Patch the CONCRETE DataFrame class: in Spark 4,
    # pyspark.sql.DataFrame is an abstract facade and the classic
    # session instantiates pyspark.sql.classic.dataframe.DataFrame,
    # whose own writeTo would shadow a patch on the facade.
    monkeypatch.setattr(
        type(df),
        "writeTo",
        lambda self, t: _RecordingWriterV2(t, calls),
    )
    write_table(df, target, spec)
    return calls


def test_iceberg_branch_emits_reference_call_chain(monkeypatch, spark, sf_dir):
    """S4+S5+S6: identity partition then hidden bucket transform, then
    create-or-replace — the exact shape of reference write.py:45-53."""
    orders = load_table(spark, sf_dir, "orders").limit(10)
    spec = WriteSpec(
        format="iceberg",
        partition_columns=["o_orderstatus"],
        bucket_column="o_custkey",
        buckets=4,
    )
    calls = _capture_write(monkeypatch, orders, "cat.db.orders_ice", spec)

    assert calls[0] == ("writeTo", "cat.db.orders_ice")
    assert calls[1] == ("using", "iceberg")
    kinds = [c[0] for c in calls]
    assert kinds[-1] == "createOrReplace", "replace semantics, not append"

    (partitioned,) = [c for c in calls if c[0] == "partitionedBy"]
    cols = partitioned[1]
    # Identity partitions precede the bucket transform (write.py:49-50).
    assert any("o_orderstatus" in c and "bucket" not in c for c in cols)
    assert any("bucket(4, o_custkey)" in c for c in cols)
    assert cols.index(
        next(c for c in cols if "bucket" in c)
    ) == len(cols) - 1


def test_iceberg_branch_unpartitioned_skips_partitionedBy(
    monkeypatch, spark, sf_dir
):
    """No layout spec → no partitionedBy call at all (a zero-arg
    partitionedBy would be an AnalysisException on a real catalog)."""
    region = load_table(spark, sf_dir, "region")
    calls = _capture_write(
        monkeypatch, region, "cat.db.region_ice", WriteSpec(format="iceberg")
    )
    assert [c[0] for c in calls] == ["writeTo", "using", "createOrReplace"]


def test_iceberg_branch_forwards_options(monkeypatch, spark, sf_dir):
    """Write options (e.g. target-file-size) pass through to the v2
    writer before any transform is applied."""
    region = load_table(spark, sf_dir, "region")
    spec = WriteSpec(
        format="iceberg",
        options={"write.target-file-size-bytes": "134217728"},
    )
    calls = _capture_write(monkeypatch, region, "cat.db.region_ice", spec)
    assert ("option", "write.target-file-size-bytes", "134217728") in calls
