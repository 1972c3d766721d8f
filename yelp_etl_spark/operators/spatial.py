"""Planar spatial operators: grid-cell bucketed radius join.

The classical spatial-join plan (fixed-grid bucketing — the same
candidate-generation idea as PostGIS's ST_DWithin over a gridded
index, or the Sedona fixed-grid partitioner): bucket every point into
a square cell of side == the search radius, so every match within
``radius`` of a query point lies in the query's cell or one of its 8
neighbors. Candidates come from a plain EQUI-join on the cell key
(shuffle- or broadcast-hashable — never a cross join, never a
theta-join), and the exact predicate is verified on the candidate set
only.

Scale: candidates per query are bounded by the point density of the
3×3 cell neighborhood, so the join output is O(|queries|·density·9r²)
— linear in the query count at fixed density. The cell join shuffles
on a two-component integer key; Catalyst plans it like any other
equi-join (broadcast when one side is small). Coordinates and
distances stay in exact BIGINT arithmetic (squared distances — no
sqrt, no trig), so results replay bit-identically in any engine.

Reference anchor: the reference's Yelp data model carries business
latitude/longitude (data/business.json) but ships no spatial
operator; this is the radius-search capability that domain implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _floor_div(name: str, side: int) -> Column:
    """True-floor cell index of an integer coordinate column — the
    repo's portable-floor convention: truncating ``div`` minus one
    when a negative dividend has a remainder (identical semantics to
    DuckDB's ``//`` and ``%``). Pure 64-bit INTEGER arithmetic — a
    float division here would go inexact past 2^53 and silently shift
    border points one cell over, dropping true matches from the 3×3
    candidate set."""
    return F.expr(
        f"CAST(`{name}` AS BIGINT) div {side} - "
        f"(CASE WHEN `{name}` % {side} != 0 AND `{name}` < 0 "
        f"THEN 1 ELSE 0 END)"
    )


def grid_radius_join(
    queries: DataFrame,
    points: DataFrame,
    radius: int,
    query_id: str = "qid",
    point_id: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """All (query, point) pairs with squared planar distance
    ≤ ``radius``² — exact, via grid-cell candidate generation.

    Inputs carry integer coordinates named ``x``/``y`` (quantize
    floats to a fixed grid upstream; integer math is what makes the
    result engine-exact). Returns (query_id, point_id, d2) where
    ``d2`` is the exact squared distance in BIGINT."""
    pts = points.select(
        F.col(point_id),
        F.col(x).cast("long").alias("__px"),
        F.col(y).cast("long").alias("__py"),
        _floor_div(x, radius).alias("__cx"),
        _floor_div(y, radius).alias("__cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in NEIGHBOR_OFFSETS
        ]
    )
    probe = (
        queries.select(
            F.col(query_id),
            F.col(x).cast("long").alias("__qx"),
            F.col(y).cast("long").alias("__qy"),
            _floor_div(x, radius).alias("__qcx"),
            _floor_div(y, radius).alias("__qcy"),
            F.explode(offsets).alias("__o"),
        )
        .select(
            query_id,
            "__qx",
            "__qy",
            (F.col("__qcx") + F.col("__o.dx")).cast("long").alias("__cx"),
            (F.col("__qcy") + F.col("__o.dy")).cast("long").alias("__cy"),
        )
    )
    d2 = (F.col("__px") - F.col("__qx")) * (F.col("__px") - F.col("__qx")) + (
        F.col("__py") - F.col("__qy")
    ) * (F.col("__py") - F.col("__qy"))
    return (
        probe.join(pts, ["__cx", "__cy"])
        .select(query_id, point_id, d2.cast("long").alias("d2"))
        .filter(F.col("d2") <= radius * radius)
    )
