"""Markov-chain marketing attribution (removal effects).

The data-driven alternative to last-touch heuristics (Anderl et al.
2014): model user journeys as a first-order Markov chain over channel
states with absorbing 'conv'/'null' ends, then credit each channel by
its REMOVAL EFFECT — how much total conversion probability disappears
when the channel's transitions are deleted (redirected to null,
unnormalized — the standard definition).

Scale split: the expensive part — building per-user journeys and
counting transitions over billions of events — is fully distributed
(per-user windows bounded by a user's event count, then one keyed
agg to |states|² cells). The value iteration then runs on the
collected transition matrix: a ≤(|channels|+3)²-row MODEL object,
the same bounded-collect discipline as k-means centroids or logreg
gradients (clustering.py / classify.py). Absorption probabilities
use k fixed synchronous steps with per-term ppm floor arithmetic
(exact integers), so the whole trajectory unrolls into a SQL oracle.

Reference parity: the reference's gold layer stops at flat event
aggregates (run-all-pipelines.sh); this generalizes its event stream
to the attribution question every marketing pipeline asks of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def journey_transitions(
    events: DataFrame,
    absorber: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user journey transition counts: order each user's events by
    (ts, id), truncate at the first ``absorber`` event (mapped to the
    absorbing state 'conv'), prepend 'start', and close non-converting
    journeys with 'null'. Returns (frm, two, n) — one distributed
    window pass (bounded per user) plus one keyed agg."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wu = Window.partitionBy(user_col)
    seq = (
        events.select(user_col, type_col, ts_col, id_col)
        .withColumn("seq", F.row_number().over(w))
        .withColumn(
            "fp",
            F.min(
                F.when(F.col(type_col) == absorber, F.col("seq"))
            ).over(wu),
        )
        .withColumn("last_seq", F.max("seq").over(wu))
    )
    kept = seq.filter(
        F.col("fp").isNull() | (F.col("seq") <= F.col("fp"))
    ).withColumn(
        "state",
        F.when(F.col(type_col) == absorber, F.lit("conv")).otherwise(
            F.col(type_col)
        ),
    )
    steps = kept.select(
        F.coalesce(
            F.lag("state").over(w), F.lit("start")
        ).alias("frm"),
        F.col("state").alias("two"),
    )
    terminals = kept.filter(
        F.col("fp").isNull() & (F.col("seq") == F.col("last_seq"))
    ).select(F.col("state").alias("frm"), F.lit("null").alias("two"))
    return (
        steps.unionByName(terminals)
        .groupBy("frm", "two")
        .agg(F.count("*").alias("n"))
    )


def _absorption_ppm(
    t_rows: list[tuple[str, str, int]], steps: int
) -> int:
    """k-step absorption probability of 'conv' from 'start', exact
    integer ppm arithmetic: v_k[s] = Σ (T_ppm[s,s']·v_{k-1}[s']) // PPM
    with the conv self-loop keeping conv at PPM. Floor per term, so
    any engine replays the identical integers."""
    v = {"conv": PPM}
    for _ in range(steps):
        nxt: dict[str, int] = {}
        for frm, two, p in t_rows:
            vv = v.get(two, 0)
            if vv:
                nxt[frm] = nxt.get(frm, 0) + (p * vv) // PPM
        nxt["conv"] = PPM  # absorbing
        v = nxt
    return v.get("start", 0)


def markov_removal_attribution(
    events: DataFrame,
    channels: list[str],
    absorber: str = "purchase",
    steps: int = 6,
    **journey_kwargs,
) -> DataFrame:
    """Removal-effect attribution over the journey Markov chain:
    returns one row per channel —
    (channel, p_full_ppm, p_removed_ppm, removal_effect_ppm) where
    removal_effect = (p − p_without_channel)/p, floor-ppm.

    ``channels`` must be the STATIC channel vocabulary (literal in the
    SQL oracle too); transitions involving states outside
    channels∪{start,conv,null} are ignored. The transition matrix is
    collected (≤(|channels|+3)² rows — a model, not data) and the
    fixed-step value iteration runs in exact integer ppm; everything
    upstream is distributed."""
    spark = events.sparkSession
    reserved = {"start", "conv", "null", absorber}
    bad = sorted(set(channels) & reserved)
    if bad:
        raise ValueError(
            f"channels {bad!r} collide with reserved states "
            f"(start/conv/null) or the absorber {absorber!r}: the "
            "absorber is renamed 'conv' before counting, so listing it "
            "as a channel would return confidently-zero credit"
        )
    states = set(channels) | {"start", "conv", "null"}
    trans = journey_transitions(events, absorber, **journey_kwargs).filter(
        F.col("frm").isin(list(states)) & F.col("two").isin(list(states))
    )
    tot = trans.groupBy("frm").agg(F.sum("n").alias("tot"))
    t_df = trans.join(tot, "frm").select(
        "frm",
        "two",
        F.floor(F.lit(PPM) * F.col("n") / F.col("tot"))
        .cast("long")
        .alias("p_ppm"),
    )
    # bounded model collect: ≤ (|channels|+3)² transition cells
    t_rows = [
        (r["frm"], r["two"], r["p_ppm"]) for r in t_df.collect()
    ] + [("conv", "conv", PPM)]
    p_full = _absorption_ppm(t_rows, steps)
    out = []
    for c in sorted(channels):
        t_c = [(f, t, p) for f, t, p in t_rows if f != c and t != c]
        p_c = _absorption_ppm(t_c, steps)
        effect = (PPM * (p_full - p_c)) // p_full if p_full else 0
        out.append((c, p_full, p_c, effect))
    return spark.createDataFrame(
        out,
        "channel string, p_full_ppm long, p_removed_ppm long, "
        "removal_effect_ppm long",
    )
