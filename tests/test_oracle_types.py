"""Oracle type lint: no catalog oracle may emit a DuckDB type the
driver's value-hasher mis-canonicalizes.

Root cause of every red CORRECTNESS row in rounds 1-4: DuckDB
``SUM(BIGINT)`` returns HUGEINT (int128), which the driver's
pandas/arrow fetch canonicalizes differently than BIGINT/DOUBLE, so
the value hash diverges even when the values are identical. This test
walks every entry of ``oracle_sql_map()`` through DuckDB ``DESCRIBE``
on the sf0.001 views (no execution — plan-time types only, cheap) and
fails on any forbidden type, keeping the class extinct.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from yelp_etl_spark.plans.catalog import oracle_sql_map
from yelp_etl_spark.sources.readers import TABLES

from scripts.check_parity import FORBIDDEN_ORACLE_TYPES, oracle_type_problems

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    yield c
    c.close()


def test_no_oracle_emits_forbidden_types(con):
    offenders = {}
    for name, sql in oracle_sql_map().items():
        bad = oracle_type_problems(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles emit driver-unsafe types {FORBIDDEN_ORACLE_TYPES}: "
        f"{offenders} — wrap the aggregate in CAST(... AS BIGINT)"
    )


def test_harness_catches_hugeint_fixture(con):
    """The type-aware parity harness must flag a deliberately
    HUGEINT-emitting oracle (SUM over BIGINT without a cast)."""
    bad = oracle_type_problems(con, "SELECT SUM(n_chars) AS s FROM documents")
    assert bad == ["s:HUGEINT"]
    ok = oracle_type_problems(
        con, "SELECT CAST(SUM(n_chars) AS BIGINT) AS s FROM documents"
    )
    assert ok == []
