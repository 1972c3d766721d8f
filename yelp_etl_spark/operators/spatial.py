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


def point_in_polygon_join(
    points: DataFrame,
    polygons: list[tuple[int, list[tuple[int, int]]]],
    point_id: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Point-in-polygon containment join (the other half of a planar
    spatial layer next to grid_radius_join): each point is tested
    against every polygon by the even-odd ray-crossing rule (Shimrat
    1962 / the classic PNPOLY formulation), entirely in exact BIGINT
    arithmetic.

    ``polygons`` is a small driver-side list of (polygon_id,
    [(x, y), ...]) vertex rings — the geofence/region table of a
    spatial workload, always tiny relative to the point set. The
    edge table (polygon_id, x1, y1, x2, y2, bbox) is built as
    literals and BROADCAST: the plan is scan points → broadcast
    nested-loop on the bounding box (a cheap range predicate that
    prunes almost everything) → per-(point, edge) crossing flags →
    groupBy(point, polygon) parity. No shuffle on the big side
    beyond the final keyed agg; at 100 TB the points stream through
    map-side against the broadcast edge list.

    Exactness: a horizontal ray from (px, py) crosses edge
    (x1,y1)-(x2,y2) iff the edge straddles py ((y1 <= py) != (y2 <=
    py)) and the intersection abscissa exceeds px — tested as
    sign((x1-px)*(y2-y1) + (x2-x1)*(py-y1)) == sign(y2-y1), i.e.
    ``num * (y2 - y1) > 0``, one exact integer cross product, no
    division. Callers must keep point ordinates off the vertex
    ordinates (even polygon coords, odd point coords) so the
    horizontal-ray-through-vertex case never arises — validated here
    on BOTH sides, not silently wrong: polygon vertices are checked
    driver-side at plan-build (they are literals), and the point side
    is checked DISTRIBUTED — the __py projection routes any even point
    y-ordinate through raise_error, so a violating input fails the job
    loudly at execution instead of returning ambiguous parity. A point lying exactly ON a vertical edge's
    line (num == 0) contributes no crossing from that edge; its
    containment then resolves deterministically from the remaining
    edges (strict-inequality convention, identical on both engines —
    pinned by the property test's Python reference).

    Returns (point_id, polygon_id) pairs for contained points."""
    rows = []
    for poly_id, ring in polygons:
        closed = list(ring) + [ring[0]]
        if any(py_ % 2 != 0 for _, py_ in ring):
            # explicit raise, not assert: -O would strip an assert and
            # turn the boundary case into silent wrong parity
            raise ValueError(
                "polygon vertex y-ordinates must be even (points use odd)"
                " so the ray-crossing boundary case cannot arise"
            )
        for (x1, y1), (x2, y2) in zip(closed, closed[1:]):
            rows.append((poly_id, x1, y1, x2, y2))
    minx = {p: min(v[0] for v in ring) for p, ring in polygons}
    maxx = {p: max(v[0] for v in ring) for p, ring in polygons}
    miny = {p: min(v[1] for v in ring) for p, ring in polygons}
    maxy = {p: max(v[1] for v in ring) for p, ring in polygons}
    edges = F.array(
        *[
            F.struct(
                F.lit(p).alias("polygon_id"),
                F.lit(x1).cast("long").alias("x1"),
                F.lit(y1).cast("long").alias("y1"),
                F.lit(x2).cast("long").alias("x2"),
                F.lit(y2).cast("long").alias("y2"),
                F.lit(minx[p]).cast("long").alias("minx"),
                F.lit(maxx[p]).cast("long").alias("maxx"),
                F.lit(miny[p]).cast("long").alias("miny"),
                F.lit(maxy[p]).cast("long").alias("maxy"),
            )
            for (p, x1, y1, x2, y2) in rows
        ]
    )
    px, py = F.col("__px"), F.col("__py")
    e = F.col("__e")
    straddle = (e.y1 <= py) != (e.y2 <= py)
    num = (e.x1 - px) * (e.y2 - e.y1) + (e.x2 - e.x1) * (py - e.y1)
    crosses = straddle & (num * (e.y2 - e.y1) > 0)
    # distributed point-side parity guard (the polygon twin of the
    # driver-side even-vertex check above): % follows the dividend in
    # Spark, so `% 2 == 0` catches even negatives too
    py_raw = F.col(y).cast("long")
    py_checked = F.when(py_raw.isNull() | (py_raw % 2 != 0), py_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "point_in_polygon_join: point y-ordinate must be odd "
                    "(polygon vertices use even) to keep the horizontal "
                    "ray off every vertex; got "
                ),
                py_raw.cast("string"),
            )
        )
    )
    return (
        points.select(
            F.col(point_id),
            F.col(x).cast("long").alias("__px"),
            py_checked.alias("__py"),
            F.explode(edges).alias("__e"),
        )
        .filter(
            (px >= e.minx) & (px <= e.maxx) & (py >= e.miny) & (py <= e.maxy)
        )
        .groupBy(point_id, e.polygon_id.alias("polygon_id"))
        .agg(F.sum(crosses.cast("long")).alias("__crossings"))
        .filter(F.col("__crossings") % 2 == 1)
        .select(point_id, "polygon_id")
    )
