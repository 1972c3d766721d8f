"""Join-input pruning: bloom-style membership prefilters.

The reference avoids join shuffles only via static layout (Iceberg
``bucket(8, business_id)`` + storage-partitioned-join confs,
reference ``write.py:50`` and ``enrich.py:35-43``).  That helps when
BOTH sides share the layout; it does nothing for the common 100 TB
case — a huge fact joined to a *filtered* dimension, where most fact
rows have no partner and are shuffled only to be dropped by the join.

``membership_prefilter`` is the dynamic complement: hash the build
side's join keys into a compact bucket set (a one-hash bloom filter
whose "bitmap" is a broadcast relation of distinct ``int`` bucket
ids), then broadcast-semi-join the probe side on its bucketed key
BEFORE the real join's shuffle.  False positives are possible (two
keys sharing a bucket) and harmless — the exact join still runs after
the prefilter, so results are identical; the win is that the probe
side's shuffle write shrinks to roughly the matching fraction.

Why a relation of bucket ids instead of a real bit-array bloom
filter: Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected as
``bloom_filter_might_contain``) already covers the bit-array design
JVM-side when its size thresholds trigger; below those thresholds —
and from PySpark, where ``BloomFilterAggregate`` isn't exposed — a
broadcast hash semi-join on ``xxhash64(key) % m`` ints is
whole-stage-codegen-friendly, needs no driver collect, and dedups to
at most ``min(distinct_keys, m)`` rows regardless of how wide the
build side's rows are.

At scale: m = 2**20 caps the broadcast at ~8 MB of longs; the
prefilter's false-positive rate is ~ distinct_keys / m with one hash
(choose m >= 100x expected distinct keys). The broadcast replaces a
full shuffle of the probe side with a map-side filter, the same
motion Spark's DPP performs for partition columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1 << 20


def _bucket(key: Column, num_buckets: int) -> Column:
    # xxhash64 is JVM-side and codegen'd; pmod keeps the id positive.
    return F.pmod(F.xxhash64(key), F.lit(num_buckets))


def membership_prefilter(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Filter ``probe`` to rows whose hashed key bucket appears among
    ``build``'s key buckets — a superset of the true join matches
    (false-positive rate ~ distinct build keys / num_buckets, never
    false negatives). Runs as broadcast-hash left-semi on an int
    column, i.e. a map-side filter with no shuffle of ``probe``."""
    buckets = build.select(
        _bucket(F.col(build_key), num_buckets).alias("__bucket")
    ).distinct()
    return probe.join(
        F.broadcast(buckets),
        _bucket(F.col(probe_key), num_buckets) == F.col("__bucket"),
        "left_semi",
    )


def prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | None = None,
    probe_key: str | None = None,
    build_key: str | None = None,
    how: str = "inner",
    num_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact join with a membership prefilter on the probe side.

    Equivalent to ``probe.join(build, ...)`` for inner / left_semi /
    right-preserving joins (the prefilter only drops probe rows that
    cannot match), but the probe side's shuffle carries only rows
    whose bucket is live on the build side."""
    if on is not None:
        probe_key = build_key = on
    if probe_key is None or build_key is None:
        raise ValueError("pass on= or both probe_key= and build_key=")
    if how in ("left", "left_outer", "full", "full_outer", "left_anti"):
        raise ValueError(
            f"how={how!r} preserves unmatched probe rows; a probe-side "
            "prefilter would change the result"
        )
    pruned = membership_prefilter(probe, probe_key, build, build_key, num_buckets)
    if on is not None:
        return pruned.join(build, on, how)
    return pruned.join(build, F.col(probe_key) == F.col(build_key), how)
