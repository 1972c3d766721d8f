"""Data-integrity operators: portable Bloom-filter join pruning and
order-independent table checksums.

Both generalize the reference's implicit data-validation needs (the
ETL's dim/fact joins, yelp-etl ``yelp_etl/tasks/clean.py`` join keys;
its write path has no verification step at all) into the two
primitives a 100 TB lakehouse actually runs daily:

* **Runtime-filter join pruning** — build a tiny Bloom filter from the
  (filtered) build side of a join and semi-prune the probe side's
  scan BEFORE the shuffle. Spark's own ``spark.sql.optimizer.
  runtimeFilter.bloomFilter.enabled`` does this opaquely inside the
  JVM; this twin is *engine-portable* (md5-derived bit positions), so
  an external system — or the DuckDB oracle — reproduces the exact
  same bit array and the exact same kept/pruned decision per row.
  Sibling: ``operators/prune.py membership_prefilter`` keeps the
  filter as a bucket-id relation for codegen-friendly in-engine
  semi-joins; this one packs true k-hash bits for export (~KBs) and
  cross-engine replay.
* **Merkle-style table checksum** — an order- and partition-
  independent fingerprint per key-bucket plus a grand total, letting
  two clusters (or two snapshots of the same table) prove equality —
  or localize a divergence to a bucket — by exchanging O(buckets)
  rows instead of re-reading 100 TB.

Everything is exact integer math on the repo's portable 60-bit hash
(`sampling.hash60`), so the DuckDB oracles replay bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yelp_etl_spark.functions.sampling import hash60

# 32-bit words keep every mask strictly positive in a signed 64-bit
# lane: both Spark's `shiftleft` and DuckDB's `<<` are well-defined
# there, with no sign-bit edge case at position 63 to reason about.
BLOOM_WORD_BITS = 32


def _h1h2(key: Column) -> tuple[Column, Column]:
    """Two independent 60-bit hashes from ONE md5 (hex slices [1,15]
    and [17,31] — disjoint halves of the 128-bit digest). All k Bloom
    bit positions derive from these by Kirsch–Mitzenmacher double
    hashing, bit_j = (h1 + j·h2) mod m, so the probe side pays one
    md5 per row instead of k — measured 3× cheaper on the hot path
    (the probe scan of a 100 TB fact pays this per row). DuckDB twin:
    the same two substr slices of the same md5."""
    hx = F.md5(key.cast("string").cast("binary"))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    return h1, h2


def _km_bit(h1: Column, h2: Column, seed: int, n_bits: int) -> Column:
    # h1 + (k-1)·h2 < k·2^60 stays far under 2^63 — no overflow
    return (h1 + F.lit(seed) * h2) % F.lit(n_bits)


def _mask(bit: Column) -> Column:
    """1 << (bit % 32) as a long. pow-based because PySpark's
    ``shiftleft`` wrapper only takes a Python int shift; 2^b for
    b < 32 is exact in a double, so the round-trip is lossless."""
    return F.pow(F.lit(2.0), (bit % BLOOM_WORD_BITS).cast("int")).cast("long")


def bloom_build(
    df: DataFrame, key_column: str, n_bits: int, n_hashes: int
) -> DataFrame:
    """Aggregate the build side into a Bloom filter as a
    ``(word, bits)`` table of at most ``n_bits / 32`` rows.

    Plan shape: one generator (k rows per key, k is 3-7) fused into
    the scan's codegen stage, then a single map-side-combined
    ``bit_or`` aggregate — the shuffle carries at most ``n_bits/32``
    word cells regardless of build-side row count. At 100 TB the
    filter for a 1M-key dim at 10 bits/key is ~40 KB: broadcast it
    (`bloom_prune` does) and the probe side's scan drops non-matching
    rows BEFORE its join shuffle — Spark's runtime-filter rewrite,
    made portable and inspectable.
    """
    h1, h2 = _h1h2(F.col(key_column))
    hashes = F.array(
        *[_km_bit(F.col("__h1"), F.col("__h2"), j, n_bits) for j in range(n_hashes)]
    )
    return (
        df.select(h1.alias("__h1"), h2.alias("__h2"))
        .select(F.explode(hashes).alias("bit"))
        .select(
            (F.col("bit") / F.lit(BLOOM_WORD_BITS)).cast("long").alias("word"),
            _mask(F.col("bit")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_column: str,
    n_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Keep only probe rows whose key passes the Bloom filter (all k
    bits set). No false negatives, by construction; false positives at
    the standard (1 - e^{-kn/m})^k rate.

    The filter joins broadcast (≤ n_bits/32 rows) once per hash seed —
    k broadcast hash joins, zero shuffles of the probe side; the whole
    prune is map-only and fuses around the probe scan. Absent words
    mean empty bits, hence the left join + coalesce(bits, 0).

    The word table's lineage is truncated first (it is ≤ n_bits/32
    rows, so materialization is trivially cheap): Catalyst does not
    reuse the broadcast exchange across the k renamed joins, and
    without the cut the build-side scan + aggregate would re-execute
    once per hash seed. Lazily (eager=False): the build side
    materializes at the pruned frame's FIRST action, not at query
    construction — plan-only consumers (schema lints, explain) pay
    nothing.
    """
    from yelp_etl_spark.functions.checkpoint import truncate_lineage

    bloom = truncate_lineage(bloom, eager=False)
    h1, h2 = _h1h2(F.col(key_column))
    # materialize the two hash halves ONCE per probe row; every seed's
    # word/mask is then integer arithmetic over these columns (without
    # this projection each seed re-evaluates the md5 chain — measured
    # ~3× slower on the probe scan)
    pruned = probe.withColumn("__h1", h1).withColumn("__h2", h2)
    for j in range(n_hashes):
        bit = _km_bit(F.col("__h1"), F.col("__h2"), j, n_bits)
        word_j = (bit / F.lit(BLOOM_WORD_BITS)).cast("long")
        mask_j = _mask(bit)
        b = F.broadcast(
            bloom.select(
                F.col("word").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
            )
        )
        pruned = (
            pruned.withColumn(f"__w{j}", word_j)
            .withColumn(f"__m{j}", mask_j)
            .join(b, f"__w{j}", "left")
            # NULL-SAFE equality, deliberately: a plain == here implies
            # an isnotnull(__m{j}) constraint, and constraint inference
            # pushes that below the __h1/__h2 projection — re-inlining
            # the md5 chain into a pre-projection filter, 2 evaluations
            # per SEED per probe row (measured 4.5 s vs 1.6 s at sf0.1,
            # r15 optimization round). <=> infers no notnull constraint;
            # the mask is never null, so kept rows are identical.
            .filter(
                F.coalesce(F.col(f"__b{j}"), F.lit(0))
                .bitwiseAND(F.col(f"__m{j}"))
                .eqNullSafe(F.col(f"__m{j}"))
            )
            .drop(f"__w{j}", f"__m{j}", f"__b{j}")
        )
    return pruned.drop("__h1", "__h2")


def py_bit_positions(value, n_bits: int, n_hashes: int) -> list[int]:
    """Pure-Python twin of the ``_h1h2`` + ``_km_bit`` scheme for
    metadata consumers (the snapshot layer's per-file Bloom sidecars):
    one md5 of the value's string form; h1/h2 are the digest's hex
    slices [0:15]/[16:31] (Spark substring 1-indexed [1,15]/[17,15]);
    bit_j = (h1 + j·h2) mod n_bits — so a filter built from pyarrow
    values on an executor and a probe computed on the driver agree
    bit-for-bit with the Spark expression."""
    import hashlib

    hx = hashlib.md5(f"{value}".encode()).hexdigest()
    h1, h2 = int(hx[0:15], 16), int(hx[16:31], 16)
    return [(h1 + j * h2) % n_bits for j in range(n_hashes)]


# Checksums sum 60-bit hashes; decimal(38,0) accumulation is exact to
# ~10^38 ≫ 2^60 × any plausible row count, and DuckDB's HUGEINT SUM
# matches it exactly. The final value folds back into a BIGINT via a
# modulus low enough that (sum % MOD) stays portable: both engines
# compute % on a nonnegative decimal identically.
CHECKSUM_MOD = 1 << 61


def table_checksum(
    df: DataFrame, columns: list[str], bucket_key: str, n_buckets: int = 16
) -> DataFrame:
    """Order-independent per-bucket checksum + row count, one keyed
    map-side-combined aggregate.

    Each row's fingerprint is the portable 60-bit hash of its
    canonicalized column rendering (NULL-sentineled ``concat_ws``,
    unit-separator delimited so value boundaries can't alias);
    fingerprints are summed (commutative — partitioning, ordering, and
    merge tree cannot change the result) per hash-bucket of
    ``bucket_key``. Two tables are equal iff all buckets match; a
    single divergent bucket localizes WHERE they differ, so a 100 TB
    cross-cluster diff exchanges ``n_buckets`` rows, then re-reads
    only the offending bucket's partitions — the Merkle-tree descent,
    one level deep.
    """
    return (
        _fp_bucket(df, columns, bucket_key, n_buckets)
        .groupBy("bucket")
        .agg(
            (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(CHECKSUM_MOD))
            .cast("long")
            .alias("checksum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _fp_bucket(
    df: DataFrame, columns: list[str], bucket_key: str, n_buckets: int
) -> DataFrame:
    """(bucket, fp) per row — the shared rendering of table_checksum
    and its incremental maintainer (one definition, so the two can
    never drift)."""
    rendered = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in columns]
    )
    return df.select(
        (hash60(F.col(bucket_key)) % F.lit(n_buckets)).alias("bucket"),
        hash60(rendered).alias("fp"),
    )


def table_checksum_incremental(
    base: DataFrame,
    old_rows: DataFrame,
    new_rows: DataFrame,
    columns: list[str],
    bucket_key: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Maintain a table checksum from a CDC delta instead of a full
    re-read: ``base`` is ``table_checksum`` of the previous version;
    ``old_rows`` are the PREVIOUS versions of touched rows (changed +
    removed), ``new_rows`` the CURRENT versions (changed + added).
    Returns the same (bucket, checksum, n_rows) shape as a full
    recompute of the new version — exactly equal, because the checksum
    is a commutative sum in fingerprint space: C₂[b] = (C₁[b] +
    Σ fp_new − Σ fp_old) mod M, row counts likewise. Touched rows are
    O(delta); at 100 TB this keeps continuous integrity verification
    proportional to the change stream, not the table (the consumer
    half of the snapshot layer's changelog, sources/snapshots.py
    snapshot_changes).

    The delta aggregate shuffles at most 2·n_buckets cells; the join
    back onto ``base`` broadcasts. Untouched buckets pass through."""
    minus = _fp_bucket(old_rows, columns, bucket_key, n_buckets).select(
        "bucket", (-F.col("fp")).alias("d"), F.lit(-1).alias("dn")
    )
    plus = _fp_bucket(new_rows, columns, bucket_key, n_buckets).select(
        "bucket", F.col("fp").alias("d"), F.lit(1).alias("dn")
    )
    delta = (
        minus.unionByName(plus)
        .groupBy("bucket")
        .agg(
            F.sum(F.col("d").cast("decimal(38,0)")).alias("d"),
            F.sum("dn").alias("dn"),
        )
    )
    mod = F.lit(CHECKSUM_MOD).cast("decimal(38,0)")
    # FULL outer: a delta may populate a bucket the base never had
    # (inserts hashing to a previously empty bucket) — a left join
    # would silently drop those rows from the integrity state. The
    # symmetric case (a delta emptying a bucket) must VANISH like it
    # does in a full recompute (no rows → no group), hence the
    # n_rows > 0 filter; its checksum term is exactly 0 by then
    # (C₁ − Σfp_old ≡ 0), so nothing is lost.
    adjusted = F.coalesce(
        F.col("checksum").cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)")
    ) + F.coalesce(F.col("d"), F.lit(0))
    return (
        base.join(delta, "bucket", "full_outer")
        .select(
            "bucket",
            (((adjusted % mod) + mod) % mod).cast("long").alias("checksum"),
            (
                F.coalesce(F.col("n_rows"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            )
            .cast("long")
            .alias("n_rows"),
        )
        .filter(F.col("n_rows") > 0)
    )
