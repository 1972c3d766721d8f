#!/usr/bin/env python
"""Isolated per-query optimization probe (guide §1): warm each named
query once on the sf0.001 sibling (codegen/JIT), then time min-of-K
noop-sink runs at the target SF, labeling jobs so UI/eventlog traces
map back. Prints one line per query.

    python scripts/opt_probe.py [sf_dir] query [query ...] [--runs K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_etl_spark.plans.catalog import QUERIES
from yelp_etl_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1] if "=" in a else a.replace("--runs", "") or 3)
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            QUERIES[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            print(f"WARN warmup failed for {name}: {e}", file=sys.stderr)
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        print(
            f"{name}: min={min(times):.3f} all={[round(t, 3) for t in times]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
