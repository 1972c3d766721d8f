#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle on the same
parquet, compares row count, column names, and order-insensitive values
(sorted columns, sorted rows, rounded doubles). Usage:

    python scripts/check_parity.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` rehearses the DRIVER's session shape instead of the
engine's: a bare Spark 4 builder with ANSI mode forced on and none of
get_spark's confs (no AQE/broadcast/Arrow/UTC tuning). Every catalog
query must still pass — the engine may rely on its confs for SPEED,
never for correctness (r10 VERDICT task 7 extended this rehearsal from
the 50-query window to the full catalog).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from yelp_etl_spark.plans.catalog import QUERIES
from yelp_etl_spark.session import get_spark
from yelp_etl_spark.sources.readers import TABLES


# DuckDB result types the driver's value-hasher cannot round-trip
# (int128 leaves the BIGINT domain; pandas/arrow fetch canonicalizes it
# differently than the str() normalization below, so a str-only compare
# is blind to the divergence — the root cause of every r1-r4 red row).
FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def oracle_type_problems(con, sql: str) -> list[str]:
    """Columns of ``sql``'s result whose DuckDB type the driver's
    hasher mis-canonicalizes (e.g. SUM(BIGINT) -> HUGEINT)."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"{name}:{ctype}"
        for name, ctype, *_ in desc
        if any(bad in str(ctype).upper() for bad in FORBIDDEN_ORACLE_TYPES)
    ]


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def vanilla_spark():
    """The driver's own session shape: bare builder, ANSI on, no
    engine confs. Everything the engine needs to read the fixtures
    (nanos repair, UTC guard) must come from its own readers."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("parity-check-vanilla")
        .master("local[8]")
        .config("spark.sql.ansi.enabled", "true")
        # NO session.timeZone conf: the driver doesn't set one either;
        # load_table's UTC-equivalence guard must accept the JVM
        # default zone (Etc/UTC in this container) on its own
        .getOrCreate()
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if vanilla:
        spark = vanilla_spark()
        print("session: VANILLA (bare Spark 4 builder, ANSI on)")
    else:
        spark = get_spark("parity-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    failures = []
    n_checked = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            bad_types = oracle_type_problems(con, spec.oracle)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if bad_types:
            problems.append(f"oracle emits driver-unsafe types: {bad_types}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            cs, co = canonical(srows, scols), canonical(orows, ocols)
            if cs != co:
                ndiff = sum(1 for a, b in zip(cs, co) if a != b)
                problems.append(f"values differ ({ndiff} of {len(cs)} rows)")
                for a, b in list(zip(cs, co))[:2000]:
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  oracle: {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{n_checked - len(failures)}/{n_checked} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
