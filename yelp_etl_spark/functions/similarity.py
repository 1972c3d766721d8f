"""Embedding similarity search: brute-force cosine top-k and an
LSH-bucketed approximate variant for scale.

Everything runs on Catalyst array built-ins (zip_with / aggregate) —
JVM-side, no Python. At 100 TB the brute-force variant is O(Q×N) work
distributed as: broadcast the (small) query set, one map-only pass over
candidates, then a per-query top-k via aggregation — no shuffle of the
candidate table itself.

The scale path is random-hyperplane LSH (sign sketches): candidates and
queries hash into buckets; the join only scores within-bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def squared_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """cosine = dot / sqrt(|a|^2 * |b|^2) — single-sqrt form for exact
    parity with DuckDB's list_cosine_similarity formulation."""
    return dot(a, b) / F.sqrt(squared_norm(a) * squared_norm(b))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query among candidates.

    Returns (query_id, neighbor_id, cosine_sim, rank). Queries are
    broadcast (assumed small); similarity is rounded before ranking so
    results are stable across float summation orders, with neighbor id
    as the tiebreak.
    """
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("__cvec"),
    ).withColumn("__cn2", squared_norm(F.col("__cvec")))
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("__qvec"),
    ).withColumn("__qn2", squared_norm(F.col("__qvec")))
    pairs = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = dot(F.col("__qvec"), F.col("__cvec")) / F.sqrt(
        F.col("__qn2") * F.col("__cn2")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(sim, round_digits).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with a < b and
    cosine ≥ threshold. This is the exact all-pairs formulation (the
    dedup oracle); at 100 TB pre-bucket with lsh_topk's hyperplane
    sketches and verify only within-bucket candidates."""
    # Norms are computed ONCE per vector before the pair join — inside
    # the join the per-pair work is a single dot product. (cosine() per
    # pair re-derives both norms: measured 20×+ slower at 2M pairs.)
    v = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("__v")
    ).withColumn("__n2", squared_norm(F.col("__v")))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    sim = dot(F.col("a.__v"), F.col("b.__v")) / F.sqrt(
        F.col("a.__n2") * F.col("b.__n2")
    )
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(sim, round_digits).alias("cosine_sim"),
    ).filter(F.col("cosine_sim") >= threshold)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_ids: list[int] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: partition candidates into inverted
    lists by nearest centroid; each query scores only the lists of its
    ``n_probe`` nearest centroids.

    Centroids are sampled deterministically from the data (the vectors
    whose ids sit at the n_centroids id-quantiles) rather than
    k-means-trained — at 100 TB you'd train centroids offline on a
    sample and broadcast them, which is exactly the shape here: the
    centroid matrix is driver-held (never more than n_centroids rows
    collected), assignment is a map-only numpy GEMM over Arrow batches,
    and the probe join is an equi-join on centroid id. Recall/cost
    dials: n_centroids (list granularity) and n_probe (lists searched).

    ``centroid_ids`` pins the centroid vectors to explicit candidate
    ids instead of the id-quantile sample — the offline-trained-
    centroids contract made literal, and (being engine-agnostic) what
    makes the whole pipeline oracle-checkable in plain SQL.
    """
    import numpy as np
    import pandas as pd

    if centroid_ids is not None:
        cid_values = list(centroid_ids)
    else:
        # Deterministic centroid sample: ids at the n_centroids
        # quantiles of the id distribution (one cheap aggregate), then
        # ONLY those rows collected via a pushed-down isin filter — the
        # driver never holds more than n_centroids vectors regardless
        # of table size (the production analog: train centroids
        # offline, broadcast them).
        quantiles = F.array(
            *[F.lit(i / n_centroids) for i in range(n_centroids)]
        )
        cid_values = candidates.agg(
            F.percentile_approx(id_col, quantiles, F.lit(10_000))
        ).collect()[0][0]
    centroid_rows = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in candidates.select(id_col, vec_col)
        .filter(F.col(id_col).isin([int(c) for c in set(cid_values)]))
        .collect()
    )

    # Assignment: numpy GEMM against the broadcast centroid matrix via
    # Arrow mapInPandas — one (batch × dim) @ (dim × m) product per
    # batch instead of m interpreted dot-product expressions per row.
    # Centroids ordered by id DESC so a stable argsort breaks cosine
    # ties toward the larger centroid id (deterministic).
    centroid_rows.sort(key=lambda r: -r[0])
    cmat = np.array([v for _, v in centroid_rows], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0] = 1.0
    cids = np.array([c for c, _ in centroid_rows], dtype=np.int64)

    def assigned(df: DataFrame, id_alias: str, vec_alias: str, n2_alias: str, n_lists: int) -> DataFrame:
        src = df.select(
            F.col(id_col).alias(id_alias),
            as_double_array(F.col(vec_col)).alias(vec_alias),
        )
        out_schema = T.StructType(
            [
                src.schema[id_alias],
                src.schema[vec_alias],
                T.StructField(n2_alias, T.DoubleType()),
                T.StructField("__lists", T.ArrayType(T.LongType())),
            ]
        )

        def go(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.array(pdf[vec_alias].to_list(), dtype=np.float64)
                n2 = (vecs * vecs).sum(axis=1)
                denom = np.sqrt(n2)[:, None] * cnorm[None, :]
                denom[denom == 0] = 1.0
                # round before ranking centroids: assignment must not
                # depend on BLAS summation order near exact ties (and
                # becomes replicable by a sequential-sum SQL oracle)
                sims = np.round((vecs @ cmat.T) / denom, 9)
                order = np.argsort(-sims, axis=1, kind="stable")[:, :n_lists]
                pdf = pdf.assign(
                    **{
                        n2_alias: n2,
                        "__lists": [list(cids[row]) for row in order],
                    }
                )
                yield pdf

        return src.mapInPandas(go, out_schema)

    cand_assigned = assigned(candidates, "neighbor_id", "__cvec", "__cn2", 1).select(
        "neighbor_id", "__cvec", "__cn2", F.col("__lists").getItem(0).alias("list_id")
    )
    qry_assigned = assigned(queries, "query_id", "__qvec", "__qn2", n_probe).select(
        "query_id", "__qvec", "__qn2", F.explode("__lists").alias("list_id")
    )
    pairs = cand_assigned.join(F.broadcast(qry_assigned), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = dot(F.col("__qvec"), F.col("__cvec")) / F.sqrt(
        F.col("__qn2") * F.col("__cn2")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(sim, 4).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long"))
    )


def embedding_neardup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
    round_digits: int = 4,
) -> DataFrame:
    """All-pairs cosine near-dup via blocked matrix multiply: vectors
    group into ``n_blocks`` blocks; block pairs (upper triangle) join;
    each block pair runs one numpy GEMM inside mapInPandas and emits
    only pairs over the threshold.

    Versus the row-per-pair formulation (embedding_neardup_pairs):
    the shuffle moves each vector ~n_blocks times instead of N times,
    and the O(N²·d) multiply runs vectorized in BLAS instead of one
    interpreted expression per pair — measured 10×+ faster at 2k
    vectors, and the gap widens with N. This is the scale shape: at
    real N, LSH/IVF prune block pairs first; the GEMM kernel stays.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    v = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    ).withColumn("blk", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int"))
    blocks = v.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v")).alias("items")
    )
    bp = (
        blocks.select(
            F.col("blk").alias("blk_a"), F.col("items").alias("items_a")
        )
        .join(
            blocks.select(
                F.col("blk").alias("blk_b"), F.col("items").alias("items_b")
            ),
            F.col("blk_a") <= F.col("blk_b"),
        )
    )

    def gemm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.array([it["id"] for it in row["items_a"]])
                mat_a = np.stack([np.asarray(it["v"]) for it in row["items_a"]])
                ids_b = np.array([it["id"] for it in row["items_b"]])
                mat_b = np.stack([np.asarray(it["v"]) for it in row["items_b"]])
                na = np.sqrt((mat_a * mat_a).sum(axis=1))
                nb = np.sqrt((mat_b * mat_b).sum(axis=1))
                sims = (mat_a @ mat_b.T) / np.outer(na, nb)
                sims = np.round(sims, round_digits)
                ia, ib = np.nonzero(sims >= threshold)
                if row["blk_a"] == row["blk_b"]:
                    # same block: each unordered pair appears twice → keep
                    # the ordered half (also drops the diagonal)
                    keep = ids_a[ia] < ids_b[ib]
                    lo, hi = ids_a[ia][keep], ids_b[ib][keep]
                    s = sims[ia, ib][keep]
                else:
                    # distinct blocks: every unordered pair appears once,
                    # but id order does not follow block order → canonicalize
                    lo = np.minimum(ids_a[ia], ids_b[ib])
                    hi = np.maximum(ids_a[ia], ids_b[ib])
                    s = sims[ia, ib]
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(s)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                    "cosine_sim": np.concatenate(out_s) if out_s else [],
                }
            )

    return bp.mapInPandas(gemm, "id_a long, id_b long, cosine_sim double")


def lsh_params_for(
    n_vectors: int,
    target_bucket_size: int = 64,
    n_bands: int = 4,
    max_bits: int = 30,
) -> tuple[int, int]:
    """Size banded-LSH (n_bands, n_bits) for a corpus of ``n_vectors``.

    Within-bucket candidate pairs grow ~(N/2^bits)²·2^bits per band, so
    bits must scale with log2(N) to hold per-bucket work constant — a
    FIXED bit width goes superlinear as data grows (measured: the 4×8
    catalog config is ~linear at sf0.1 but slope ~16 on a 10×
    replica probe). This returns bits = ceil(log2(N / target_bucket)),
    keeping expected bucket occupancy ≈ target_bucket_size; recall at a
    given cosine threshold then follows 1-(1-p^bits)^bands, so raise
    n_bands when raising bits if recall must hold.

    Note exact duplicates always share every bucket regardless of
    sizing — run exact dedup (functions/dedup.exact_dedup) BEFORE
    near-dup candidate generation, as a production pipeline does.
    """
    import math

    if n_vectors <= target_bucket_size:
        return n_bands, 4
    bits = math.ceil(math.log2(n_vectors / target_bucket_size))
    return n_bands, max(4, min(bits, max_bits))


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    n_bits: int = 8,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs with LSH-pruned candidate
    generation — the 100 TB default (the exact all-pairs forms,
    embedding_neardup_pairs / _blocked, are the small-N witnesses).

    Banded random-hyperplane LSH: each vector gets ``n_bands`` bucket
    ids (``n_bits`` sign bits each); a pair is a CANDIDATE iff it
    collides in at least one band, and candidates are verified with the
    exact cosine ≥ threshold. Semantics are fully deterministic (planes
    seeded, plan-time constants), so the result is reproducible and
    oracle-checkable — recall vs the exact all-pairs answer is the
    standard banded-LSH curve 1-(1-p^bits)^bands, p = 1-θ/π (≈0.89 for
    cosine 0.95 at 4×8; tune bands/bits per threshold).

    Scale shape: bucket assignment is one numpy GEMM per Arrow batch
    (map-only); candidate generation is an EQUI-join on (band, bucket)
    — shuffle-partitionable, skew-salvageable, never a cross join; the
    per-pair exact dot runs only on the pruned candidate set, JVM-side.
    Shuffled bytes carry (id, band, bucket) plus one vector fetch join
    per side — each vector moves O(n_bands + matches) times, not O(N).
    """
    import numpy as np

    planes = random_hyperplanes(dim, n_bands * n_bits, seed)
    pmat = np.array(planes, dtype=np.float64)  # (bands*bits, dim)
    weights = 2 ** np.arange(n_bits - 1, -1, -1)

    src = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("__v")
    )
    bucket_schema = T.StructType(
        [
            src.schema["id"],
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["__v"].to_list(), dtype=np.float64)
            # Quantize the plane dot before taking the sign: the GEMM's
            # summation order differs from a sequential dot (the DuckDB
            # oracle's list_dot_product), and a ULP-level sign flip near
            # 0 would put a vector in different buckets per engine. A
            # 1e-9 round (mirrored in the oracle SQL) absorbs that.
            bits = np.round(vecs @ pmat.T, 9) >= 0  # (n, bands*bits)
            buckets = (
                bits.reshape(len(vecs), n_bands, n_bits) * weights
            ).sum(axis=2)  # (n, bands)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy().repeat(n_bands),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(vecs)
                    ),
                    "bucket": buckets.astype(np.int64).ravel(),
                }
            )

    hashed = src.mapInPandas(assign, bucket_schema)
    a, b = hashed.alias("a"), hashed.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # a pair colliding in several bands must be scored once
        .dropDuplicates(["id_a", "id_b"])
    )
    v = src.withColumn("__n2", squared_norm(F.col("__v")))
    va = v.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n2").alias("__na"),
    )
    vb = v.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n2").alias("__nb"),
    )
    sim = dot(F.col("__va"), F.col("__vb")) / F.sqrt(
        F.col("__na") * F.col("__nb")
    )
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(sim, round_digits).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy needed on
    executors — these are plan-time literals)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-sketch bucket id: bit i = sign(vec · plane_i). Vectors with
    high cosine similarity collide with high probability."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for plane in planes
    ]
    bucket = F.lit(0)
    for bit in bits:
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only within-LSH-bucket pairs. At scale
    this turns the O(Q×N) cross join into an equi-join on bucket id —
    shuffle-partitionable and skew-manageable (salt hot buckets)."""
    import numpy as np

    planes = random_hyperplanes(dim, n_planes, seed)
    # Bucket assignment as one numpy matmul per Arrow batch (bit i =
    # sign(vec · plane_i), first plane = MSB — same bits as the
    # lsh_bucket expression form, kept above for single-column use):
    # n_planes interpreted dot expressions per row don't survive wide
    # batches; (batch × dim) @ (dim × n_planes) does. Map-only either
    # way — zero shuffle before the bucket equi-join.
    pmat = np.array(planes, dtype=np.float64)  # (n_planes, dim)
    weights = 2 ** np.arange(n_planes - 1, -1, -1)

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str, n2_alias: str) -> DataFrame:
        src = df.select(
            F.col(id_col).alias(id_alias),
            as_double_array(F.col(vec_col)).alias(vec_alias),
        )
        out_schema = T.StructType(
            [
                src.schema[id_alias],
                src.schema[vec_alias],
                T.StructField(n2_alias, T.DoubleType()),
                T.StructField("bucket", T.LongType()),
            ]
        )

        def go(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.array(pdf[vec_alias].to_list(), dtype=np.float64)
                # round before the sign so BLAS-vs-sequential summation
                # order can't flip a bucket bit for dots ~0 (same
                # quantization as embedding_neardup_pairs_lsh, which
                # makes the bucketing oracle-replicable in SQL)
                bits = np.round(vecs @ pmat.T, 9) >= 0
                yield pdf.assign(
                    **{
                        n2_alias: (vecs * vecs).sum(axis=1),
                        "bucket": (bits * weights).sum(axis=1),
                    }
                )

        return src.mapInPandas(go, out_schema)

    cand = bucketed(candidates, "neighbor_id", "__cvec", "__cn2")
    qry = bucketed(queries, "query_id", "__qvec", "__qn2")
    pairs = cand.join(F.broadcast(qry), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = dot(F.col("__qvec"), F.col("__cvec")) / F.sqrt(
        F.col("__qn2") * F.col("__cn2")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(sim, 4).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long"))
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions with a DETERMINISTIC Rademacher (±1/√out_dim) matrix:
    sign(d, j) comes from one md5 hex digit of "d_j", so the matrix is
    reproducible in any engine with md5 — no RNG, no seed state, and
    an oracle can rebuild it cell-for-cell. JL: pairwise distances and
    norms are preserved within ~1/√out_dim relative error w.h.p. —
    the standard pre-step that makes downstream ANN/clustering cheap
    when dim is large (project once, index the short vectors).

    Shape: component rows (readers.fan_out-widened explode) joined to
    the broadcast dim×out_dim sign table on the INPUT dimension, one
    partial-aggregated shuffle keyed (id, j), then one per-id
    aggregation packing the sorted components back into an
    array<double>. Nothing wider than (id, 2 ints, double) shuffles;
    the sign table is dim×out_dim tiny and generated column-wise from
    the hash, never materialized driver-side.

    Returns (id, projected array<double>). Values are exact doubles;
    round at the comparison site when checking cross-engine (the
    per-cell products are order-independent, the per-j sum is a
    partial agg whose ~1e-16 order noise rounding absorbs).
    """
    from yelp_etl_spark.sources.readers import fan_out

    spark = df.sparkSession
    comp = (
        fan_out(df, id_col)
        .select(
            F.col(id_col),
            F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x"),
        )
    )
    # dim is data-dependent; derive it from one row (cheap limit-1 job)
    dim = len(df.select(vec_col).limit(1).collect()[0][0])
    sign = (
        spark.range(dim)
        .select(F.col("id").cast("int").alias("pos"))
        .crossJoin(
            spark.range(out_dim).select(F.col("id").cast("int").alias("j"))
        )
        .select(
            "pos",
            "j",
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", F.col("pos"), F.col("j"))),
                            18,
                            1,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 2
                    * 2
                    - 1
                ).cast("double")
                / F.lit(float(out_dim) ** 0.5)
            ).alias("r"),
        )
    )
    proj = (
        comp.join(F.broadcast(sign), "pos")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("x") * F.col("r")).alias("y"))
    )
    return proj.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "y"))),
            lambda s: s["y"],
        ).alias("projected")
    )


def quantize_embeddings(
    df: DataFrame,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Scalar int8-style quantization: per-vector symmetric scale
    q = round(v * (2^(bits-1) - 1) / max|v|). Cuts vector bytes 4×
    before an ANN index build — at 100 TB of embeddings the scan and
    shuffle bytes drop proportionally, which matters more than the
    rounding error for candidate generation (re-rank on full precision
    afterwards). Map-only array lambdas, no shuffle, no UDF."""
    qmax = float(2 ** (bits - 1) - 1)
    v = F.col(vector_column)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(max_abs > 0, qmax / max_abs).otherwise(F.lit(0.0))
    return df.select(
        id_column,
        F.transform(v, lambda x: F.round(x * scale).cast("int")).alias(
            "q_vec"
        ),
        F.round(scale, 6).alias("scale"),
    )


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 10_000,
    codebook_ids: list[int] | None = None,
) -> DataFrame:
    """Product-quantization approximate top-k (Jégou et al., PAMI'11 —
    the memory-bound ANN path): vectors are cut into ``m`` subspaces,
    each encoded as the id of its nearest sub-codebook centroid
    (``2^nbits`` per subspace), and queries score candidates through an
    asymmetric-distance (ADC) lookup table — ``m`` table gathers per
    candidate instead of a d-dim dot product.

    Why this is the 100 TB shape: the scan that scoring touches shrinks
    from 4·d bytes to m·nbits/8 bytes per vector (256 B → 4 B here,
    64×) plus one stored norm — the candidate table becomes small
    enough to keep hot. Codebooks are driver-held by design
    (m × 2^nbits × d/m floats — the production analog is offline
    k-means training, broadcast to executors); here they come from the
    same deterministic id-quantile sample as ivf_topk. Encoding is one
    Arrow-batched numpy GEMM per subspace, map-only. Scoring emits a
    per-batch partial top-k per query (the combiner), so the final
    shuffle carries ≤ batches·Q·k rows, never Q×N.

    Approximation error comes from quantizing the CANDIDATE side only
    (queries stay exact — 'asymmetric'); production re-ranks the top
    candidates on full precision, which is brute_force_topk over the
    survivors. Returns (query_id, neighbor_id, approx_cosine, rank).

    Driver-memory contract: the QUERY side is collected to the driver
    to build the Q×m×2^nbits ADC lookup tables shipped to executors —
    that is the deliberate ADC design (per-query LUTs must exist where
    scoring runs), but it bounds Q. ``max_query_rows`` (default 10k ≈
    a few MB of LUT at these m/nbits) enforces the bound: a larger
    query set raises ValueError rather than silently OOMing the driver.
    For query sets beyond the cap, chunk the queries and union the
    results, or flip the roles (the big side must be the candidates).
    """
    import numpy as np
    import pandas as pd

    n_cent = 2**nbits

    if codebook_ids is not None:
        # Explicit codebook rows (the offline-trained contract, same as
        # ivf_topk's centroid_ids) — engine-agnostic, which is what
        # lets a SQL oracle rebuild the identical sub-codebooks.
        cid_values = list(codebook_ids)
    else:
        # -- deterministic codebook sample: the n_cent exact quantiles
        # of the ID RANGE (lo + i·(hi−lo)//n_cent). One min/max agg
        # (cheaper than the percentile_approx sketch this replaced, and
        # exact), ids that fall in gaps simply select nothing — both
        # properties any SQL engine replays verbatim, which is what
        # lets the DEFAULT path carry a value oracle, not just the
        # explicit-codebook one.
        row = candidates.agg(
            F.min(id_col).cast("long"), F.max(id_col).cast("long")
        ).collect()[0]
        lo, hi = int(row[0]), int(row[1])
        cid_values = [lo + (i * (hi - lo)) // n_cent for i in range(n_cent)]
    sample = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in candidates.select(id_col, vec_col)
        .filter(F.col(id_col).isin([int(c) for c in set(cid_values)]))
        .collect()
    )
    dim = len(sample[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    smat = np.array([v for _, v in sample], dtype=np.float64)
    # codebook[j]: (n_cent, sub) — subspace j centroids. Duplicate
    # sample rows are fine (codes just never pick the duplicate).
    codebooks = np.stack(
        [smat[:, j * sub : (j + 1) * sub] for j in range(m)]
    )

    # limit(cap+1) keeps even the failure path's driver transfer bounded
    collected = queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(collected) > max_query_rows:
        raise ValueError(
            f"pq_topk query side exceeds max_query_rows={max_query_rows}; "
            "chunk the queries (union the results) or swap query/candidate "
            "roles — per-query ADC LUTs are driver-built by design"
        )
    qrows = sorted((r[0], [float(x) for x in r[1]]) for r in collected)
    qids = np.array([q for q, _ in qrows], dtype=np.int64)
    qmat = np.array([v for _, v in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm[qnorm == 0] = 1.0
    # LUT[q, j, c] = <query_q subspace j, codebook[j][c]>
    lut = np.einsum("qjs,jcs->qjc", qmat.reshape(len(qrows), m, sub), codebooks)

    src = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("__vec"),
    )
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("approx_cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            xnorm = np.sqrt((X * X).sum(axis=1))
            xnorm[xnorm == 0] = 1.0
            Xs = X.reshape(len(X), m, sub)
            # encode: nearest centroid per subspace (squared L2; the
            # ||x_j||² term is constant per argmin and dropped)
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                d2 = -2.0 * Xs[:, j, :] @ codebooks[j].T + (
                    codebooks[j] * codebooks[j]
                ).sum(axis=1)
                # round before argmin: code assignment must not depend
                # on BLAS summation order near exact ties (argmin takes
                # the first/lowest index on ties — the same total order
                # a sequential-sum SQL twin uses)
                codes[:, j] = np.round(d2, 9).argmin(axis=1)
            # ADC, all queries at once: approx dot (Q, n) built by one
            # LUT gather per SUBSPACE (m ≈ 8 numpy ops), never a Python
            # loop over Q (which with the 10k query cap would cost 10k
            # interpreter iterations per batch)
            adc = np.zeros((len(qids), len(X)), dtype=np.float64)
            for j in range(m):
                adc += lut[:, j, :][:, codes[:, j]]
            # round BEFORE the in-batch sort: the batch truncation must
            # use exactly the total order the final window ranks on
            # (rounded score desc, id asc) — sorting on unrounded sims
            # would let two candidates that tie after rounding be
            # kept/dropped based on which batch they landed in
            sims = np.round(adc / (qnorm[:, None] * xnorm[None, :]), 4)
            # exclude self-pairs, then per-query partial top-k; the
            # selection loop is numpy-only and the batch emits ONE
            # DataFrame (Q pandas constructions per batch would cost
            # more than the scoring at the 10k query cap)
            sims[qids[:, None] == ids[None, :]] = -np.inf
            sel_q, sel_n, sel_s = [], [], []
            for qi, qid in enumerate(qids):
                valid = np.isfinite(sims[qi])
                order = np.lexsort((ids[valid], -sims[qi][valid]))[:k]
                sel_ids = ids[valid][order]
                sel_q.append(np.full(len(sel_ids), qid, dtype=np.int64))
                sel_n.append(sel_ids)
                sel_s.append(sims[qi][valid][order])
            if sel_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(sel_q),
                        "neighbor_id": np.concatenate(sel_n),
                        "approx_cosine": np.concatenate(sel_s),
                    }
                )

    partial = src.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "approx_cosine", F.col("rank").cast("long")
        )
    )


def lsh_bucket_sql(dim: int, n_planes: int, seed: int = 42) -> str:
    """DuckDB expression rebuilding lsh_topk's seeded hyperplane bucket
    id over a ``emb`` DOUBLE[] column — shared by every ANN oracle twin
    (repr() round-trips the plane doubles exactly; sign bits MSB-first,
    dots rounded at 9 digits exactly like the Spark side)."""
    planes = random_hyperplanes(dim, n_planes, seed)

    def lit(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    terms = [
        "(CASE WHEN ROUND(list_dot_product(emb, "
        f"{lit(planes[i])}), 9) >= 0 "
        f"THEN {2 ** (n_planes - 1 - i)} ELSE 0 END)"
        for i in range(n_planes)
    ]
    return "(" + " + ".join(terms) + ")"


def cosine_sim_sql(left: str = "q", right: str = "c", digits: int = 4) -> str:
    """DuckDB expression for the 4-digit rounded cosine between two
    ``emb`` DOUBLE[] columns — the ONE definition every ANN oracle
    twin shares (rounding digits / tie convention live here; a drift
    between copies would make the oracles silently disagree)."""
    return (
        f"ROUND(list_dot_product({left}.emb, {right}.emb) / "
        f"SQRT(list_dot_product({left}.emb, {left}.emb) * "
        f"list_dot_product({right}.emb, {right}.emb)), {digits})"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_column: str = "doc_id",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner for lexical + dense retrieval:

        RRF(d) = Σ_lists 1 / (k + rank_list(d))

    Each input frame is one ranking: (id, rank) with rank ≥ 1. The
    fusion is a fold of outer joins keyed on the id (each list is
    top-k-bounded, so every join side is tiny and broadcasts); the
    score is ONE fixed expression tree of per-list 1/(k+rank) terms
    with absent lists contributing exactly 0.0 — no float
    accumulation, so the fused score is engine-exact. Returns
    (id, rrf, rank_0, rank_1, ...) top-k by score, id as tiebreak.
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(
            F.col(id_column),
            F.col("rank").cast("long").alias(f"rank_{i}"),
        )
        out = ri if out is None else out.join(ri, id_column, "full_outer")
    terms = [
        F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    score = reduce(lambda a, b: a + b, terms)
    return (
        out.select(
            id_column,
            F.round(score, 6).alias("rrf"),
            *[F.col(f"rank_{i}") for i in range(len(rankings))],
        )
        .orderBy(F.desc("rrf"), F.asc(id_column))
        .limit(top_k)
    )
