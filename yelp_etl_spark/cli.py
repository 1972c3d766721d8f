"""CLI entry point — the analog of the reference's app.py dispatch
(app.py:28-70), with a declarative pipeline registry instead of
import_module reflection.

    python -m yelp_etl_spark --pipeline extract --entity_type business \
        --input tests/fixtures/business.json --output /tmp/bronze/business \
        --partition_column date_year --bucket_column business_id --buckets 8

Pipelines:
- extract: JSON-lines → parquet/iceberg table (schema inferred, S1/S4)
- clean:   bronze table → typed/normalized silver (per-entity recipe)
- enrich:  silver fact × dimension tables → one-big-table
- gold:    enriched OBT → weekly business stats
- maintain: snapshot-table maintenance loop — compact small files,
  expire old snapshots, vacuum orphaned data files (the operational
  counterpart of Iceberg's rewrite_data_files / expire_snapshots /
  remove_orphan_files; runs in place on --input)
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from yelp_etl_spark.plans.pipelines import CLEANERS, enrich_fact
from yelp_etl_spark.session import get_spark
from yelp_etl_spark.sources.readers import read_json
from yelp_etl_spark.sources.writers import WriteSpec, write_table


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("yelp_etl_spark")
    p.add_argument(
        "--pipeline",
        required=True,
        choices=["extract", "clean", "enrich", "gold", "maintain"],
    )
    p.add_argument("--entity_type", default=None,
                   choices=["business", "review", "user", "checkin", "tip"])
    p.add_argument("--input", required=True,
                   help="path (extract), parquet dir, or snapshot table "
                        "dir (maintain)")
    p.add_argument("--output", default=None,
                   help="output parquet dir / table (all but maintain)")
    p.add_argument("--keep_last", type=int, default=2,
                   help="maintain: snapshots to retain after expiry "
                        "(>=2 keeps the pre-compaction snapshot "
                        "time-travelable)")
    p.add_argument("--target_file_mb", type=int, default=128,
                   help="maintain: compaction target file size")
    p.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "iceberg", "snapshot"],
        help="snapshot = the native manifest-snapshot table layer "
        "(sources/snapshots.py: atomic commits, time travel, file skipping)",
    )
    p.add_argument("--partition_column", default=None)
    p.add_argument("--bucket_column", default=None)
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--dimension_inputs", nargs="*", default=[],
                   help="enrich: parquet dirs of cleaned dimension tables")
    p.add_argument("--dimension_entity_types", nargs="*", default=[],
                   help="enrich: entity type per dimension input")
    return p


def make_write_spec(args: argparse.Namespace) -> WriteSpec:
    return WriteSpec(
        format=args.format,
        partition_columns=[args.partition_column] if args.partition_column else [],
        bucket_column=args.bucket_column,
        buckets=args.buckets,
    )


def run(args: argparse.Namespace, spark: SparkSession | None = None) -> None:
    spark = spark or get_spark(f"yelp-etl-{args.pipeline}-{args.entity_type}")
    if args.pipeline == "maintain":
        from yelp_etl_spark.sources.snapshots import (
            expire_snapshots,
            snapshot_compact,
            vacuum,
        )

        snapshot_compact(
            spark, args.input, target_file_bytes=args.target_file_mb * 2**20
        )
        expired = expire_snapshots(args.input, keep_last=args.keep_last)
        removed = vacuum(args.input)
        print(
            f"maintain {args.input}: compacted; expired "
            f"{len(expired)} snapshot(s); vacuumed {removed} file(s)"
        )
        return
    if args.entity_type is None or args.output is None:
        raise SystemExit(
            f"--entity_type and --output are required for {args.pipeline}"
        )
    if args.pipeline == "extract":
        df = read_json(spark, args.input)
    elif args.pipeline == "clean":
        df = CLEANERS[args.entity_type](spark.read.parquet(args.input))
    elif args.pipeline == "enrich":
        fact = spark.read.parquet(args.input)
        dims = {
            etype: spark.read.parquet(path)
            for etype, path in zip(args.dimension_entity_types, args.dimension_inputs)
        }
        df = enrich_fact(fact, dims)
    else:  # gold: weekly business stats over an enriched review OBT
        from yelp_etl_spark.plans.pipelines import gold_weekly_business_stats

        df = gold_weekly_business_stats(spark.read.parquet(args.input))
    write_table(df, args.output, make_write_spec(args))


def main(argv: list[str] | None = None) -> None:
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
