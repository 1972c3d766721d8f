#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 fixtures K× into /tmp and measure
how headline queries scale with input size. A query whose runtime grows
~linearly (slope ≈ K on K× data) is shuffle/partition-healthy; one that
grows superlinearly has a pair blow-up or skew problem to fix before it
ever sees 100 TB.

    python scripts/scale_probe.py [K] [query ...]

Replication keeps keys disjoint per copy (ids offset by copy index) so
join fan-outs and group cardinalities scale honestly rather than
overlapping.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_etl_spark.plans.catalog import QUERIES
from yelp_etl_spark.session import get_spark
from yelp_etl_spark.sources.readers import TABLES, load_table

BASE_SF = "/root/testdata/sf0.1"
DEFAULT_QUERIES = [
    "flagship_revenue",
    "pricing_summary",
    "window_topk",
    "join_left_counts",
    "dedup_exact",
    "minhash_neardup",
    "text_stats",
    "events_tumbling_window",
]

# id columns to offset per copy so keys stay disjoint
OFFSET_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
OFFSET = 10_000_000


def replicate(spark, out_dir: str, k: int) -> None:
    for name in TABLES:
        src = load_table(spark, BASE_SF, name)
        if name in ("region", "nation"):  # true dims: don't replicate
            src.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        copies = []
        for i in range(k):
            c = src
            for key in OFFSET_KEYS.get(name, []):
                c = c.withColumn(key, F.col(key) + F.lit(i * OFFSET))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    big_dir = f"/tmp/scale_probe_x{k}"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{big_dir}/lineitem.parquet"):
        replicate(spark, big_dir, k)

    results = {}
    for name in names:
        QUERIES[name].fn(spark, BASE_SF).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        QUERIES[name].fn(spark, BASE_SF).write.format("noop").mode("overwrite").save()
        t_base = time.time() - t0
        t0 = time.time()
        QUERIES[name].fn(spark, big_dir).write.format("noop").mode("overwrite").save()
        t_big = time.time() - t0
        results[name] = {
            "t_1x_sec": round(t_base, 3),
            f"t_{k}x_sec": round(t_big, 3),
            "slope": round(t_big / t_base, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)
    avg = sum(r["slope"] for r in results.values()) / len(results)
    print(json.dumps({"k": k, "avg_slope": round(avg, 2)}))


if __name__ == "__main__":
    main()
