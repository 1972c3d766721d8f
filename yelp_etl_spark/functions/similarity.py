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
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("__qvec"),
    )
    pairs = cand.crossJoin(F.broadcast(qry)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), round_digits).alias(
            "cosine_sim"
        ),
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
    v = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("__v")
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine(F.col("a.__v"), F.col("b.__v")), round_digits).alias(
            "cosine_sim"
        ),
    ).filter(F.col("cosine_sim") >= threshold)


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: partition candidates into inverted
    lists by nearest centroid; each query scores only the lists of its
    ``n_probe`` nearest centroids.

    Centroids are sampled deterministically from the data (every
    N/n_centroids-th vector by id) rather than k-means-trained — at
    100 TB you'd train centroids offline on a sample and broadcast them,
    which is exactly the shape here: the centroid table is a broadcast
    literal, assignment is a map-only pass over candidates, and the
    probe join is an equi-join on centroid id. Recall/cost dials:
    n_centroids (list granularity) and n_probe (lists searched).
    """
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("__cvec"),
    )
    # Deterministic centroid sample (every stride-th vector by id),
    # collected once and baked into the plan as literals — so list
    # assignment is a pure map-side expression, no shuffle of the
    # candidate table (the production analog: train centroids offline,
    # broadcast them).
    rows = (
        candidates.select(id_col, vec_col).orderBy(id_col).collect()
    )
    stride = max(len(rows) // n_centroids, 1)
    centroid_rows = [
        (r[0], [float(x) for x in r[1]]) for r in rows[::stride][:n_centroids]
    ]

    def nearest_lists(vec: Column, n_lists: int) -> Column:
        """Array of the n_lists centroid ids nearest to ``vec``."""
        scored = F.array(
            *[
                F.struct(
                    cosine(vec, F.array(*[F.lit(x) for x in cvec])).alias("s"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in centroid_rows
            ]
        )
        top = F.slice(F.sort_array(scored, asc=False), 1, n_lists)
        return F.transform(top, lambda t: t["cid"])

    cand_assigned = cand.withColumn(
        "list_id", nearest_lists(F.col("__cvec"), 1).getItem(0)
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("__qvec"),
    )
    qry_assigned = qry.withColumn(
        "list_id", F.explode(nearest_lists(F.col("__qvec"), n_probe))
    )
    pairs = cand_assigned.join(F.broadcast(qry_assigned), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), 4).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long"))
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
    planes = random_hyperplanes(dim, n_planes, seed)
    cand = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(F.col(vec_col)).alias("__cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("__cvec"), planes))
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(F.col(vec_col)).alias("__qvec"),
    ).withColumn("bucket", lsh_bucket(F.col("__qvec"), planes))
    pairs = cand.join(F.broadcast(qry), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qvec"), F.col("__cvec")), 4).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long"))
    )
