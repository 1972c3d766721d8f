#!/usr/bin/env python
"""Partitioning-determinism sweep: every catalog query must return
IDENTICAL rows under different physical configurations — the
"independent of cluster size" property a 100 TB deployment depends on
(executor counts, AQE coalescing, and scan splits all change between
runs; answers must not).

Each query runs twice in one session: config A is the engine default
(shuffle partitions = cores, default scan splits); config B forces a
different shuffle width AND fragminated scans (tiny maxPartitionBytes →
many input splits → different row order into every operator). Rows are
canonicalized exactly like the parity gate (sorted columns, sorted
rows, repr-normalized floats) and compared.

    python scripts/check_determinism.py [sf_dir] [query ...]

Default query set: the driver window (the 50 hard-gate queries).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_parity import canonical  # same normalization as the oracle gate

from yelp_etl_spark.plans.catalog import QUERIES, _DRIVER_WINDOW
from yelp_etl_spark.session import get_spark

CONF_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}
CONF_B = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024),
}


def run(spark, spec, sf_dir, conf):
    for k, v in conf.items():
        spark.conf.set(k, v)
    df = spec.fn(spark, sf_dir)
    return canonical([tuple(r) for r in df.collect()], df.columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or list(_DRIVER_WINDOW)
    spark = get_spark("determinism-check", cpus=8)
    failures = []
    for name in only:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            a = run(spark, spec, sf_dir, CONF_A)
            b = run(spark, spec, sf_dir, CONF_B)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: error: {e}")
            continue
        if a != b:
            failures.append(name)
            diff = next(
                (i, ra, rb) for i, (ra, rb) in enumerate(zip(a, b)) if ra != rb
            ) if len(a) == len(b) else ("row-count", len(a), len(b))
            print(f"FAIL {name}: configs disagree: {diff}")
        else:
            print(f"ok   {name}: {len(a)} rows identical ({time.time()-t0:.1f}s)")
    print(f"\n{len(only) - len(failures)}/{len(only)} queries deterministic")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
