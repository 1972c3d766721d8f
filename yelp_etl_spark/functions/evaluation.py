"""Model/data evaluation metrics for training pipelines: rank-based
ROC-AUC and population-stability-index (PSI) drift monitoring.

Both are engineered for cross-engine bit-parity the same way the
clustering module is: all counting stays in exact BIGINT arithmetic,
and every floating-point expression (the final AUC ratio, each PSI
bin's term) is a single fixed expression tree of IEEE-exact ops plus
one `ln`, evaluated identically by any engine before a 6-decimal
round. No sums of floats anywhere — the order-dependence of float
accumulation is the usual source of flaky cross-engine/cross-run
diffs in metric code.

Reference parity: the reference pipeline has no evaluation layer
(yelp-etl's gold layer stops at aggregates, run-all-pipelines.sh:239);
these generalize it to the quality-tracking a curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def auc_score(
    df: DataFrame,
    label_column: str,
    score_column: str,
) -> DataFrame:
    """Exact ROC-AUC of ``score_column`` as a ranker for the 0/1
    ``label_column``, via the Mann-Whitney U statistic with midrank
    tie handling — the textbook estimator, computed distributed and
    in EXACT integer arithmetic until the final division.

    For each tie group g (one distinct score value) with ``cnt_g``
    rows of which ``pos_g`` are positive, the average rank is
    ``before_g + (cnt_g + 1)/2`` where ``before_g`` counts rows with
    strictly smaller score. Doubling clears the half:

        2·R_pos = Σ_g pos_g · (2·before_g + cnt_g + 1)
        AUC     = (2·R_pos − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    Plan: one partial-aggregated shuffle keyed on the score value
    (the only pass over the data), then a running-sum window over the
    DISTINCT-SCORE table only. That window is single-partition, but
    it never sees data volume — its input is one row per distinct
    score. For a continuous score at 100 TB, quantize the score first
    (e.g. ``F.round(score, 4)``) so the distinct-score table stays
    bounded; AUC over a quantized score is exactly AUC with midrank
    ties at the quantization grid.

    Rows with a NULL/NaN score or a NULL label are excluded up front —
    a NULL label is unknown, not negative, and NULL/NaN scores land in
    engine-specific rank positions (Spark ASC is NULLS FIRST, other
    engines NULLS LAST), which would break bit-parity on dirty input.
    Same convention as ``psi_drift`` / ``reliability_bins``.

    Returns one row: ``auc`` (rounded 6), ``n_pos``, ``n_neg``.
    """
    score, label = F.col(score_column), F.col(label_column)
    df = df.filter(
        score.isNotNull() & ~F.isnan(score.cast("double")) & label.isNotNull()
    )
    g = df.groupBy(F.col(score_column).alias("s")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(label_column).cast("long")).alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = g.select(
        "cnt",
        "pos",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (F.lit(2) * F.col("before") + F.col("cnt") + F.lit(1))
        ).alias("two_r_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum("cnt").alias("n"),
    )
    # 2·R_pos and n_pos·(n+1) reach ~n² — decimal(38,0) keeps them
    # exact far past int64 (n ~ 1e10 at 100 TB wraps a BIGINT sum
    # silently); the denominator multiplies in DOUBLE, which cannot
    # overflow, and both engines round the same numerator the same way
    # on the int128/decimal128 → double cast.
    return agg.select(
        F.round(
            (
                F.col("two_r_pos")
                - F.col("n_pos").cast("decimal(38,0)") * (F.col("n_pos") + F.lit(1))
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * (F.col("n") - F.col("n_pos")).cast("double")
            ),
            6,
        ).alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
    )


def fixed_bin(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped fixed-width bin id in ``[0, n_bins)`` — the
    engine-portable stand-in for width_bucket: ``floor((v−lo)/step)``
    is one subtraction, one division, one floor (all IEEE-exact given
    the same literal ``step``), so every engine assigns every value to
    the same bin."""
    step = (hi - lo) / n_bins
    raw = F.floor((value - F.lit(lo)) / F.lit(step))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_column: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    sample of ``value_column`` — the standard production drift
    monitor (PSI < 0.1 stable, > 0.25 drifted). Per-bin output so the
    alert can point at WHERE the distribution moved, not just that it
    did.

    Add-one smoothing on bin counts (``(n+1)/(total+n_bins)``) keeps
    every bin's ratio finite without dropping empty bins — the same
    convention as the Naive Bayes module. Each side is one
    partial-aggregated shuffle keyed on the bin id (n_bins cells);
    the per-bin term ``(p_a − p_b)·ln(p_a/p_b)`` is a fixed scalar
    expression over two exact BIGINT counts, so the oracle rebuilds
    it bit-for-bit. Returns ``bin, n_base, n_cur, psi_term`` ordered
    by bin; total PSI = SUM(psi_term).
    """
    def side(df: DataFrame, out: str) -> DataFrame:
        # NULL/NaN never bin: Spark floor() coerces NaN to 0 while
        # DuckDB clamps it to the top bin, and a NULL-heavy column
        # would otherwise report phantom mass in bin 0 (reviewed bug).
        return (
            df.select(F.col(value_column).alias("v"))
            .filter(F.col("v").isNotNull() & ~F.isnan("v"))
            .select(fixed_bin(F.col("v"), lo, hi, n_bins).alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(out))
        )

    bins = base.sparkSession.range(n_bins).select(F.col("id").alias("bin"))
    a = side(base, "n_base")
    b = side(current, "n_cur")
    # an EMPTY side must read as total drift, not a NULL-silenced 0.0
    tot_a = a.agg(F.coalesce(F.sum("n_base"), F.lit(0)).alias("tot_base"))
    tot_b = b.agg(F.coalesce(F.sum("n_cur"), F.lit(0)).alias("tot_cur"))
    joined = (
        bins.join(a, "bin", "left")
        .join(b, "bin", "left")
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            "tot_base",
            "tot_cur",
        )
    )
    p_a = (F.col("n_base") + F.lit(1)).cast("double") / (
        F.col("tot_base") + F.lit(n_bins)
    )
    p_b = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.col("tot_cur") + F.lit(n_bins)
    )
    return joined.select(
        "bin",
        "n_base",
        "n_cur",
        F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_term"),
    ).orderBy("bin")


def kaplan_meier(
    df: DataFrame,
    duration_column: str = "t",
    event_column: str = "churned",
) -> DataFrame:
    """Kaplan-Meier survival curve over integer durations — the
    standard retention/churn estimator. Input is one row per subject:
    an integer ``duration_column`` (e.g. days from first to last
    activity) and a 0/1 ``event_column`` (1 = the terminal event was
    observed, 0 = censored at that duration).

    S(t) = Π_{u ≤ t} (1 − d_u / n_u), with d_u observed events at
    duration u and n_u the at-risk count (subjects with duration ≥ u
    — censored subjects leave the risk set too, the KM convention).

    Distribution: ONE partial-aggregated shuffle keyed on the duration
    reduces the data to the distinct-duration table; every window
    after that (cumulative risk-set, cumulative log-product) runs over
    that small table only — same shape as ``auc_score``. The
    cumulative product is exp∘Σln with each ln(1 − d/n) QUANTIZED to
    integer micro-nats first (classify.py's convention) — windowed
    float sums combine in engine-specific orders (segment trees vs
    sequential), so the running sum must be integer to honor this
    module's no-float-accumulation rule — with a cummin guard so a
    terminal d_u = n_u step yields exact 0.0 instead of ln(0) (DuckDB
    raises on LN(0), Spark returns NULL — the guard sidesteps both).

    Returns (t, n_risk, d_event, n_censored, survival) ordered by t.
    """
    by_t = df.groupBy(F.col(duration_column).cast("long").alias("t")).agg(
        F.count("*").alias("n_end"),
        F.sum(F.col(event_column).cast("long")).alias("d_event"),
    )
    total = by_t.agg(F.sum("n_end").alias("n_total"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = (
        by_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            (F.col("n_total") - (F.sum("n_end").over(w) - F.col("n_end"))).cast(
                "long"
            ),
        )
        .withColumn(
            "factor",
            F.lit(1.0)
            - F.col("d_event").cast("double") / F.col("n_risk").cast("double"),
        )
    )
    log_q = F.when(
        F.col("factor") > 0,
        F.round(F.log("factor") * F.lit(1_000_000.0)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    log_surv_q = F.sum(log_q).over(w)
    dead = F.min("factor").over(w) <= 0
    return (
        stepped.select(
            "t",
            "n_risk",
            F.col("d_event").cast("long").alias("d_event"),
            (F.col("n_end") - F.col("d_event")).cast("long").alias("n_censored"),
            F.when(dead, F.lit(0.0))
            .otherwise(
                F.round(
                    F.exp(log_surv_q.cast("double") / F.lit(1_000_000.0)), 6
                )
            )
            .alias("survival"),
        )
        .orderBy("t")
    )


def acf(
    df: DataFrame,
    time_column: str,
    value_column: str,
    max_lag: int = 7,
) -> DataFrame:
    """Exact lag-k autocorrelation of a regularly-spaced integer
    series — the time-series diagnostic for seasonality/trend in
    activity streams (a spike at lag 7 = weekly cycle).

        r_k = Σ_t (x_t−μ)(x_{t+k}−μ) / Σ_t (x_t−μ)²

    computed with the mean CLEARED: multiplying through by n² turns
    both sums into integer algebra over ``n·x_t − S`` (S = Σx), so
    every accumulation is exact DECIMAL(38,0) under any partitioning
    and the only float op is the final division — the same
    overflow-safe discipline as ``auc_score`` (n·x reaches ~1e14 on a
    year of 1e10-event days; squares pass int64).

    Input: one row per time step (``time_column`` an integer or date
    step index, ``value_column`` integer). Plan: one broadcast 1-row
    stats table, a lag table cross-joined (max_lag rows), one
    self-join keyed on the shifted step — the series table is
    step-cardinality (small by construction: a day-level series at
    100 TB is ~10⁴ rows), so every join broadcasts.

    Returns (lag, n_pairs, r) for lag = 1..max_lag, ordered by lag.
    """
    d = df.select(
        F.col(time_column).alias("step"),
        F.col(value_column).cast("long").alias("x"),
    )
    # centered-in-integers series: c_t = n·x_t − S
    stats = d.agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    c = d.crossJoin(F.broadcast(stats)).select(
        "step",
        (
            F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
        ).alias("c"),
    )
    den = c.agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    lags = df.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = c.select(F.col("step").alias("step_a"), F.col("c").alias("ca"))
    b = c.select(F.col("step").alias("step_b"), F.col("c").alias("cb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("step_b") == F.col("step_a") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).alias("num"),
        )
    )
    # the docstring promises every lag in 1..max_lag: a lag with no
    # pairs (series shorter than lag+1) would vanish from the inner
    # join, so re-anchor on the lag grid with n_pairs = 0, r = 0
    pairs = lags.join(pairs, "lag", "left").select(
        "lag",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("num", F.lit(0).cast("decimal(38,0)")).alias("num"),
    )
    # a constant series has den = 0 (every c_t = 0): define r = 0.0
    # rather than 0/0 NaN (which also diverges NaN-vs-NULL cross-engine).
    # An EMPTY series has den = NULL (SUM over zero rows) — same
    # definition, r = 0.0 for every promised lag, matching the
    # oracle's `den = 0 OR num IS NULL` branch.
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.when(F.col("den").isNull() | (F.col("den") == 0), F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("num").cast("double") / F.col("den").cast("double"),
                    6,
                )
            )
            .alias("r"),
        )
        .orderBy("lag")
    )


def benford_audit(df: DataFrame, value_column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fraud/synthetic-data audit for positive integer measures
    (naturally-occurring multi-scale quantities follow
    P(d) = log10(1 + 1/d); fabricated or truncated data usually
    doesn't).

    Engine-portability: the first digit comes from the INTEGER's
    string rendering (identical in every engine), never from
    log10/floor arithmetic whose boundary behavior at exact powers of
    ten is library-dependent. The expected probabilities are Python
    double literals baked into the plan, so the χ² terms are one fixed
    expression tree over exact counts. One partial-aggregated shuffle
    over 9 cells.

    Returns (digit, n_obs, expected_p, chi2_term) for digits 1-9;
    total χ² = SUM(chi2_term), df = 8.
    """
    import math

    digits = df.select(
        F.substring(F.col(value_column).cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).filter((F.col("digit") >= 1) & (F.col("digit") <= 9))
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    n_tot = counts.agg(F.sum("n_obs").alias("n"))
    # the 9 expected probabilities ride in as a literal local grid —
    # the same Python double literals the oracle bakes into its CASE
    grid = df.sparkSession.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit int, p double",
    )
    joined = (
        grid.join(counts, "digit", "left")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "p",
            "n",
        )
    )
    exp_n = F.col("n").cast("double") * F.col("p")
    return joined.select(
        "digit",
        "n_obs",
        F.round(F.col("p"), 4).alias("expected_p"),
        F.round(
            (F.col("n_obs").cast("double") - exp_n)
            * (F.col("n_obs").cast("double") - exp_n)
            / exp_n,
            6,
        ).alias("chi2_term"),
    ).orderBy("digit")


def reliability_bins(
    df: DataFrame,
    prob_column: str,
    label_column: str,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration (reliability) curve: bin predicted probabilities on
    [0, 1] and compare each bin's observed positive rate to its mean
    predicted probability — the standard diagnostic before trusting a
    classifier's scores as probabilities (ECE = Σ n_b/N·|gap_b|).

    Parity discipline: probabilities are QUANTIZED to integer
    micro-units before the per-bin sum (a float mean is an
    order-dependent accumulation; an integer sum is exact under any
    partitioning), and the bin id comes from ``fixed_bin``'s portable
    floor arithmetic. Observed rate and mean-probability are one exact
    division each. One partial-aggregated shuffle over n_bins cells.

    Rows with a NULL/NaN probability or a NULL label never bin: NaN
    bins divergently across engines (the psi_drift lesson above), and
    counting unlabeled rows in n while excluding them from n_pos would
    silently score them as negatives.

    Returns (bin, n, n_pos, mean_p, obs_rate, gap) ordered by bin;
    empty bins are absent (no prediction mass — nothing to calibrate).
    """
    cells = (
        df.select(
            F.col(prob_column).alias("p"),
            F.col(label_column).cast("long").alias("y"),
        )
        .filter(
            F.col("p").isNotNull() & ~F.isnan("p") & F.col("y").isNotNull()
        )
        .select(
            fixed_bin(F.col("p"), 0.0, 1.0, n_bins).alias("bin"),
            F.round(F.col("p") * F.lit(1_000_000.0)).cast("long").alias("p_q"),
            "y",
        )
    )
    g = cells.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("p_q").alias("sum_p_q"),
    )
    mean_p = F.col("sum_p_q").cast("double") / F.col("n").cast("double") / F.lit(
        1_000_000.0
    )
    obs = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return g.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(mean_p, 6).alias("mean_p"),
        F.round(obs, 6).alias("obs_rate"),
        F.round(obs - mean_p, 6).alias("gap"),
    ).orderBy("bin")


def dcg_weight_micro(k: int) -> list[int]:
    """Integer DCG position weights round(1e6 / log2(pos+1)) for
    positions 1..k, computed ONCE in Python and injected as literals
    into both the Spark plan and the DuckDB oracle. Computing log2 on
    each engine would risk last-ulp divergence at the rounding
    boundary; a shared literal table makes the gain arithmetic exact
    BIGINT on both sides by construction."""
    import math

    return [round(1_000_000 / math.log2(p + 1)) for p in range(1, k + 1)]


def ranking_metrics(
    ranked: DataFrame,
    relevant_counts: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query ranking-quality metrics NDCG@k, MRR@k, and MAP@k —
    the standard retrieval-evaluation triple next to recall@k
    (ann_recall_at_k), run entirely in-engine.

    ``ranked``: one row per retrieved item, ``(query_id, rank, rel)``
    with rank 1..k (dense, from a deterministic top-k) and binary
    ``rel``. ``relevant_counts``: ``(query_id, n_rel)`` — the TOTAL
    number of relevant items in the corpus, used for the NDCG ideal
    ranking and the MAP normalizer (both capped at k).

    Parity discipline: DCG/IDCG use the shared integer weight table
    (``dcg_weight_micro``) so both are exact BIGINT sums; each MAP
    precision term ROUND(1e6·cum/rank) quantizes a single exact-int
    division before the sum (values m/n with n ≤ k never land on a
    .5 boundary for k ≤ 10); NDCG/MRR/MAP are one final division
    each, rounded to 6.

    Scale: the per-query window is bounded by k rows; the whole
    metric is one keyed agg plus a broadcast-sized join against the
    query set. At 100 TB the COST lives in producing ``ranked``
    (evaluate on a fixed query sample — see ann_recall_at_k); the
    metric itself is linear in |queries|·k.
    """
    w = dcg_weight_micro(k)
    cum = [0]
    for x in w:
        cum.append(cum[-1] + x)
    w_arr = F.array(*[F.lit(x) for x in w])
    cum_arr = F.array(*[F.lit(x) for x in cum[1:]])

    win = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = ranked.select(
        "query_id",
        "rank",
        F.col("rel").cast("long").alias("rel"),
    ).withColumn("cum_rel", F.sum("rel").over(win))
    p_micro = F.when(
        F.col("rel") == 1,
        F.round(F.col("cum_rel") * F.lit(1_000_000.0) / F.col("rank")).cast(
            "long"
        ),
    ).otherwise(F.lit(0))
    per_q = scored.groupBy("query_id").agg(
        F.sum(F.col("rel") * F.element_at(w_arr, F.col("rank").cast("int")))
        .cast("long")
        .alias("dcg_micro"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(p_micro).cast("long").alias("sum_p_micro"),
    )
    joined = relevant_counts.select(
        "query_id", F.col("n_rel").cast("long").alias("n_rel")
    ).join(per_q, "query_id", "left")
    ideal_n = F.least(F.col("n_rel"), F.lit(k))
    idcg_micro = F.when(
        ideal_n > 0, F.element_at(cum_arr, ideal_n.cast("int"))
    )
    ndcg = F.when(
        idcg_micro.isNotNull(),
        F.round(
            F.coalesce(F.col("dcg_micro"), F.lit(0)) / idcg_micro, 6
        ),
    ).otherwise(F.lit(0.0))
    mrr = F.coalesce(
        F.round(F.lit(1.0) / F.col("first_rel"), 6), F.lit(0.0)
    )
    ap = F.when(
        ideal_n > 0,
        F.round(
            F.coalesce(F.col("sum_p_micro"), F.lit(0))
            / (ideal_n * F.lit(1_000_000)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "query_id",
        "n_rel",
        ndcg.alias(f"ndcg_at_{k}"),
        mrr.alias("mrr"),
        ap.alias(f"map_at_{k}"),
    ).orderBy("query_id")


def nelson_aalen(
    df: DataFrame,
    duration_column: str = "t",
    event_column: str = "churned",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — Kaplan-Meier's
    sibling (H(t) = Σ_{u≤t} d_u/n_u; S ≈ exp(−H)), preferred when the
    HAZARD (instantaneous risk) is the quantity of interest or events
    are sparse. Same scaffold and parity discipline as
    ``kaplan_meier``: one keyed agg to the distinct-duration table,
    windows only over that small table, and each hazard increment
    quantized to integer micro-units BEFORE the running sum (windowed
    float sums combine engine-specifically; integer sums cannot).

    Returns (t, n_risk, d_event, cum_hazard_micro, survival_na)
    ordered by t — the hazard column is the exact BIGINT, the
    survival transform one exp + round."""
    by_t = df.groupBy(F.col(duration_column).cast("long").alias("t")).agg(
        F.count("*").alias("n_end"),
        F.sum(F.col(event_column).cast("long")).alias("d_event"),
    )
    total = by_t.agg(F.sum("n_end").alias("n_total"))
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = by_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        (
            F.col("n_total") - (F.sum("n_end").over(w) - F.col("n_end"))
        ).cast("long"),
    )
    h_term = F.round(
        F.lit(1_000_000.0) * F.col("d_event") / F.col("n_risk")
    ).cast("long")
    cum_h = F.sum(h_term).over(w)
    return (
        stepped.select(
            "t",
            "n_risk",
            F.col("d_event").cast("long").alias("d_event"),
            cum_h.cast("long").alias("cum_hazard_micro"),
            F.round(
                F.exp(-cum_h.cast("double") / F.lit(1_000_000.0)), 6
            ).alias("survival_na"),
        )
        .orderBy("t")
    )


def isotonic_fit(
    bins: DataFrame,
    order_column: str = "bucket",
    pos_column: str = "pos",
    count_column: str = "n",
) -> DataFrame:
    """Isotonic regression (PAVA) over a pre-aggregated bin table —
    monotone probability calibration, the standard post-hoc calibrator
    when a model's scores rank well but aren't probabilities (Zadrozny
    & Elkan 2002; sklearn's IsotonicRegression). The reference ships
    evaluation metrics (reliability curve above) but no calibrator;
    this closes the fit side of that pair.

    Instead of the sequential pool-adjacent-violators sweep (a
    driver-side loop), the fit uses PAVA's closed minimax form —
    iso(i) = max_{j<=i} min_{k>=i} mean(pos[j..k]/n[j..k]) (Robertson,
    Wright & Dykstra 1988, eq. 1.9-1.13) — which is two window passes
    over the O(B^2) range-mean table. Exact-integer discipline
    throughout: range means quantize to micro-units via decimal(38,0)
    cross products BEFORE the minimax (both engines then compare
    identical BIGINTs; a float mean would make the argmax tie-unstable
    across engines).

    Scale: the input aggregation (billions of rows -> B bins) is one
    map-side-combinable groupBy; everything here runs on B<=~100 rows
    (B^2 pairs ~ 10^4), a constant-cost tail stage. Returns
    (order_column, n, pos, rate_q, iso_q) with iso_q nondecreasing.

    Input contract: every bin must have count n > 0 — enforced loudly
    (the n projection routes zero/negative/NULL counts through
    raise_error). A zero-count bin would make every [j..k] range that
    is exactly that bin divide by zero; the resulting NULL mean would
    be silently SKIPPED by the minimax windows, so iso_q for nearby
    buckets would deviate from the PAVA definition instead of failing.
    Callers with sparse score buckets must drop or coalesce empty bins
    before the fit (the groupBy producing the bins never emits them
    anyway unless the caller outer-joins a bucket spine).
    """
    n_raw = F.col(count_column).cast("long")
    n_checked = F.when(n_raw > 0, n_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "isotonic_fit: every bin needs count n > 0 (empty bins "
                    "break the PAVA range means); got "
                ),
                F.coalesce(n_raw.cast("string"), F.lit("NULL")),
                F.lit(" at bucket "),
                F.coalesce(
                    F.col(order_column).cast("string"), F.lit("NULL")
                ),
            )
        )
    )
    b = bins.select(
        F.col(order_column).alias("bucket"),
        F.col(pos_column).cast("long").alias("pos"),
        n_checked.alias("n"),
    )
    w_ord = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pref = b.select(
        "bucket",
        "pos",
        "n",
        (F.sum("pos").over(w_ord) - F.col("pos")).alias("pos_before"),
        (F.sum("n").over(w_ord) - F.col("n")).alias("n_before"),
        F.sum("pos").over(w_ord).alias("pos_upto"),
        F.sum("n").over(w_ord).alias("n_upto"),
    )
    j = pref.select(
        F.col("bucket").alias("jb"),
        F.col("pos_before").alias("jp"),
        F.col("n_before").alias("jn"),
    )
    k = pref.select(
        F.col("bucket").alias("kb"),
        F.col("pos_upto").alias("kp"),
        F.col("n_upto").alias("kn"),
    )
    # range mean over [j..k] in exact micro-units; pos sums route
    # through decimal(38,0) so 1e6*pos never leaves the exact domain
    pairs = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (kp - jp)) div (kn - jn)"
            " AS BIGINT)"
        ).alias("mean_q"),
    )
    w_min = (
        Window.partitionBy("jb")
        .orderBy(F.desc("kb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = pairs.select(
        "jb", F.col("kb").alias("i"), F.min("mean_q").over(w_min).alias("m")
    )
    w_max = (
        Window.partitionBy("i")
        .orderBy("jb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iso = (
        m.select("jb", "i", F.max("m").over(w_max).alias("iso_q"))
        .filter(F.col("jb") == F.col("i"))
        .select(F.col("i").alias("bucket"), "iso_q")
    )
    return (
        pref.join(iso, "bucket")
        .select(
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * pos) div n AS BIGINT)"
            ).alias("rate_q"),
            F.col("iso_q").cast("long").alias("iso_q"),
        )
        .orderBy("bucket")
    )
