#!/usr/bin/env python
"""Run the full medallion flow on the Yelp micro-fixtures — the analog
of the reference's run-all-pipelines.sh (13 jobs: extract×5, clean×5,
enrich×3) plus the gold layer the reference left TODO.

    python scripts/run_all_pipelines.py [output_root]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_etl_spark.cli import build_parser, run
from yelp_etl_spark.session import get_spark

ENTITIES = ("business", "review", "user", "checkin", "tip")
FACT_DIMS = {
    "review": ("business", "user"),   # → user_business_review
    "checkin": ("business",),         # → business_checkin
    "tip": ("business", "user"),      # → user_business_tip
}
FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures")


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/yelp_medallion"
    spark = get_spark("yelp-run-all", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def job(argv: list[str]) -> None:
        print("JOB:", " ".join(argv), flush=True)
        run(build_parser().parse_args(argv), spark)

    for e in ENTITIES:  # bronze
        job(["--pipeline", "extract", "--entity_type", e,
             "--input", os.path.join(FIXTURES, f"{e}.json"),
             "--output", f"{root}/bronze/{e}"])
    for e in ENTITIES:  # silver
        argv = ["--pipeline", "clean", "--entity_type", e,
                "--input", f"{root}/bronze/{e}", "--output", f"{root}/silver/{e}"]
        if e in FACT_DIMS:  # facts: partition by year, bucket by business
            argv += ["--partition_column", "date_year",
                     "--bucket_column", "business_id", "--buckets", "2"]
        job(argv)
    for fact, dims in FACT_DIMS.items():  # enriched
        name = "_".join([*dims[::-1], fact]) if len(dims) > 1 else f"{dims[0]}_{fact}"
        job(["--pipeline", "enrich", "--entity_type", fact,
             "--input", f"{root}/silver/{fact}",
             "--output", f"{root}/enriched/{name}",
             "--dimension_inputs", *[f"{root}/silver/{d}" for d in dims],
             "--dimension_entity_types", *dims])
    job(["--pipeline", "gold", "--entity_type", "review",
         "--input", f"{root}/enriched/user_business_review",
         "--output", f"{root}/gold/weekly_business_stats"])

    for layer in ("bronze", "silver", "enriched", "gold"):
        for table in sorted(os.listdir(f"{root}/{layer}")):
            n = spark.read.parquet(f"{root}/{layer}/{table}").count()
            print(f"{layer}.{table}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
