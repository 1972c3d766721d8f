#!/usr/bin/env python
"""Job-count/wall profile of one catalog query (guide §1/§7): run the
query once warm at the target SF with the UI enabled, then read the
REST API for job count, summed job duration and inter-job gaps —
the scheduling-vs-data-bound diagnosis for loop-shaped operators whose
per-round structure never appears in the final frame's plan.

    python scripts/job_profile.py [sf_dir] query
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_etl_spark.plans.catalog import QUERIES
from yelp_etl_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("job-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        QUERIES[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        before = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded")
        )
        n_before = len(before)
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.time()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded")
        )
        new = [j for j in jobs if j["jobId"] not in {x["jobId"] for x in before}]
        def ms(s):
            return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float(s[20:23]) / 1000
        spans = sorted((ms(j["submissionTime"]), ms(j["completionTime"])) for j in new)
        dur = sum(b - a for a, b in spans)
        gaps = 0.0
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            if a2 > b1:
                gaps += a2 - b1
        longest = max((b - a) for a, b in spans) if spans else 0.0
        print(
            f"{name}: wall={wall:.2f}s jobs={len(new)} "
            f"sum_job_dur={dur:.2f}s inter_job_gaps={gaps:.2f}s "
            f"longest_job={longest:.2f}s"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
