"""Extension catalog — stats queries."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_etl_spark.sources.readers import load_table

from yelp_etl_spark.plans.ext._shared import (  # noqa: F401
    EXTRA_QUERIES,
    _t,
)



def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve (functions/evaluation.kaplan_meier)
    over user activity spans: duration = days from a user's first to
    last event; the terminal event is observed ("churned") when the
    last event precedes the corpus horizon by more than 3 days,
    censored otherwise. All counting reduces to the distinct-duration
    table; the cumulative product is an ordered running exp∘Σln both
    engines accumulate identically."""
    from yelp_etl_spark.functions.evaluation import kaplan_meier

    events = _t(spark, sf_dir, "events")
    horizon = events.agg(F.max("ts").alias("max_ts"))
    per_user = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("t"),
            (
                F.col("last_ts") < F.col("max_ts") - F.expr("INTERVAL 3 DAYS")
            )
            .cast("long")
            .alias("churned"),
        )
    )
    return kaplan_meier(per_user, "t", "churned")


ORACLE_KAPLAN_MEIER = """
WITH horizon AS MATERIALIZED (SELECT MAX(ts) AS max_ts FROM events),
per_user AS MATERIALIZED (
  SELECT date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t,
         CASE WHEN MAX(ts) < h.max_ts - INTERVAL 3 DAY THEN 1 ELSE 0 END
           AS churned
  FROM events CROSS JOIN horizon h
  GROUP BY user_id, h.max_ts
),
by_t AS MATERIALIZED (
  SELECT CAST(t AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n_end,
         CAST(SUM(churned) AS BIGINT) AS d_event
  FROM per_user GROUP BY t
),
tot AS MATERIALIZED (SELECT CAST(SUM(n_end) AS BIGINT) AS n_total FROM by_t),
stepped AS MATERIALIZED (
  SELECT t, n_end, d_event,
         CAST(n_total - (SUM(n_end) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                         - n_end) AS BIGINT) AS n_risk
  FROM by_t CROSS JOIN tot
),
factored AS MATERIALIZED (
  SELECT *,
         1.0 - CAST(d_event AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
  FROM stepped
)
SELECT t, n_risk, d_event,
       CAST(n_end - d_event AS BIGINT) AS n_censored,
       CASE WHEN MIN(factor) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) <= 0
            THEN 0.0
            ELSE ROUND(EXP(CAST(SUM(CASE WHEN factor > 0
                                         THEN CAST(ROUND(LN(factor) * 1000000)
                                                   AS BIGINT)
                                         ELSE 0 END)
                                OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                                AS DOUBLE) / 1000000.0), 6)
       END AS survival
FROM factored
ORDER BY t
"""


EXTRA_QUERIES.update(
    {
        "kaplan_meier": (
            q_kaplan_meier,
            ORACLE_KAPLAN_MEIER,
            "ext:Kaplan-Meier retention/survival curve",
        ),
    }
)


def q_acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series
    (functions/evaluation.acf): seasonality diagnostic in exact
    integer algebra — only the final per-lag division is float."""
    from yelp_etl_spark.functions.evaluation import acf

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("step"))
        .agg(F.count("*").alias("x"))
    )
    return acf(daily, "step", "x", max_lag=7)


ORACLE_ACF_DAILY = """
WITH daily AS MATERIALIZED (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS step,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
stats AS MATERIALIZED (
  SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM daily
),
c AS MATERIALIZED (
  SELECT step, CAST(n AS HUGEINT) * x - s AS c
  FROM daily CROSS JOIN stats
),
den AS MATERIALIZED (SELECT SUM(c * c) AS den FROM c),
lags AS MATERIALIZED (SELECT CAST(range AS INTEGER) AS lag FROM range(1, 8)),
pairs AS MATERIALIZED (
  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(a.c * b.c) AS num
  FROM c a
  CROSS JOIN lags l
  JOIN c b ON b.step = a.step + l.lag
  GROUP BY l.lag
)
SELECT l.lag,
       COALESCE(p.n_pairs, 0) AS n_pairs,
       CASE WHEN d.den = 0 OR p.num IS NULL THEN 0.0
            ELSE ROUND(CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6)
       END AS r
FROM lags l LEFT JOIN pairs p ON p.lag = l.lag CROSS JOIN den d
ORDER BY l.lag
"""


EXTRA_QUERIES.update(
    {
        "acf_daily_events": (
            q_acf_daily_events,
            ORACLE_ACF_DAILY,
            "ext:exact lag-k autocorrelation (seasonality diagnostic)",
        ),
    }
)


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (functions/evaluation.benford_audit)
    of order totals: observed first-digit counts vs log10(1+1/d) with
    per-digit χ² terms. First digits come from integer string
    rendering (engine-identical); the expected probabilities are the
    same Python double literals on both sides."""
    from yelp_etl_spark.functions.evaluation import benford_audit

    # FLOOR, not a bare double->long cast: Spark's cast truncates but
    # DuckDB's rounds (the round-4 pitfall) — floor is identical on both
    orders = _t(spark, sf_dir, "orders").select(
        F.floor("o_totalprice").alias("v")
    )
    return benford_audit(orders, "v")


def _benford_oracle() -> str:
    import math

    # CAST AS DOUBLE: DuckDB parses a bare 16-digit decimal literal as
    # DECIMAL, and ROUND(DECIMAL, 4) keeps 4-scale decimal ('0.3010')
    # while Spark's double rounds to '0.301' — type, not value, skew
    case = " ".join(
        f"WHEN d.digit = {d} THEN CAST({math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
WITH digits AS MATERIALIZED (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders
),
counts AS MATERIALIZED (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM digits WHERE digit BETWEEN 1 AND 9 GROUP BY digit
),
tot AS MATERIALIZED (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts),
grid AS MATERIALIZED (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10))
SELECT d.digit,
       CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
       ROUND(CASE {case} END, 4) AS expected_p,
       ROUND((CAST(COALESCE(c.n_obs, 0) AS DOUBLE)
              - CAST(t.n AS DOUBLE) * (CASE {case} END))
             * (CAST(COALESCE(c.n_obs, 0) AS DOUBLE)
                - CAST(t.n AS DOUBLE) * (CASE {case} END))
             / (CAST(t.n AS DOUBLE) * (CASE {case} END)), 6) AS chi2_term
FROM grid d
LEFT JOIN counts c ON c.digit = d.digit
CROSS JOIN tot t
ORDER BY d.digit
"""


EXTRA_QUERIES.update(
    {
        "benford_audit": (
            q_benford_audit,
            _benford_oracle(),
            "ext:Benford first-digit fraud/synthetic-data audit",
        ),
    }
)


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/skew.skew_report) on lineitem's
    supplier key: exact Gini + top-5 heavy-key share from one keyed
    counting pass — the pre-flight check for the salting/two-stage
    mitigations in the same module."""
    from yelp_etl_spark.operators.skew import skew_report

    return skew_report(_t(spark, sf_dir, "lineitem"), "l_suppkey", top_k=5)


ORACLE_SKEW_REPORT = """
WITH counts AS MATERIALIZED (
  SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS x
  FROM lineitem GROUP BY l_suppkey
),
ranked AS MATERIALIZED (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, k) AS BIGINT) AS rnk
  FROM counts
),
stats AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(x) AS BIGINT) AS total_rows,
         CAST(MAX(x) AS BIGINT) AS max_count,
         SUM(CAST(2 * rnk AS HUGEINT) * x) AS num_part
  FROM ranked
),
topk AS MATERIALIZED (
  SELECT CAST(SUM(x) AS BIGINT) AS top_rows
  FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, k) AS r FROM counts)
  WHERE r <= 5
)
SELECT s.n_keys, s.total_rows, s.max_count,
       ROUND(CAST(t.top_rows AS DOUBLE) / CAST(s.total_rows AS DOUBLE), 6)
         AS top5_share,
       ROUND(CAST(s.num_part
                  - CAST(s.n_keys + 1 AS HUGEINT) * s.total_rows AS DOUBLE)
             / (CAST(s.n_keys AS DOUBLE) * CAST(s.total_rows AS DOUBLE)), 6)
         AS gini
FROM stats s CROSS JOIN topk t
"""


EXTRA_QUERIES.update(
    {
        "skew_report": (
            q_skew_report,
            ORACLE_SKEW_REPORT,
            "ext:key-skew diagnostic (exact Gini + heavy-key share)",
        ),
    }
)


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (functions/evaluation.py nelson_aalen)
# --------------------------------------------------------------------------


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the same activity-span
    durations as q_kaplan_meier — hazard increments quantized to
    micro-units before the running sum, so the curve is exact BIGINT
    until the final exp. Windows run only over the distinct-duration
    table."""
    from yelp_etl_spark.functions.evaluation import nelson_aalen

    events = _t(spark, sf_dir, "events")
    horizon = events.agg(F.max("ts").alias("max_ts"))
    per_user = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("t"),
            (
                F.col("last_ts") < F.col("max_ts") - F.expr("INTERVAL 3 DAYS")
            )
            .cast("long")
            .alias("churned"),
        )
    )
    return nelson_aalen(per_user, "t", "churned")


ORACLE_NELSON_AALEN = """
WITH horizon AS MATERIALIZED (SELECT MAX(ts) AS max_ts FROM events),
per_user AS MATERIALIZED (
  SELECT date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t,
         CASE WHEN MAX(ts) < h.max_ts - INTERVAL 3 DAY THEN 1 ELSE 0 END
           AS churned
  FROM events CROSS JOIN horizon h
  GROUP BY user_id, h.max_ts
),
by_t AS MATERIALIZED (
  SELECT CAST(t AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n_end,
         CAST(SUM(churned) AS BIGINT) AS d_event
  FROM per_user GROUP BY t
),
tot AS MATERIALIZED (SELECT CAST(SUM(n_end) AS BIGINT) AS n_total FROM by_t),
stepped AS MATERIALIZED (
  SELECT t, n_end, d_event,
         CAST(n_total - (SUM(n_end) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                         - n_end) AS BIGINT) AS n_risk
  FROM by_t CROSS JOIN tot
),
hazard AS MATERIALIZED (
  SELECT t, n_risk, d_event,
         CAST(SUM(CAST(ROUND(1000000 * CAST(d_event AS DOUBLE) / n_risk)
                       AS BIGINT))
              OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_hazard_micro
  FROM stepped
)
SELECT t, n_risk, d_event, cum_hazard_micro,
       ROUND(EXP(-CAST(cum_hazard_micro AS DOUBLE) / 1000000), 6)
         AS survival_na
FROM hazard ORDER BY t
"""


EXTRA_QUERIES.update(
    {
        "nelson_aalen": (
            q_nelson_aalen,
            ORACLE_NELSON_AALEN,
            "ext:Nelson-Aalen cumulative hazard (micro-quantized running sum)",
        ),
    }
)


# --------------------------------------------------------------------------
# Seasonal decomposition: trend (centered MA) + day-of-week indices
# --------------------------------------------------------------------------


def q_seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily revenue series:
    trend = centered 7-observation moving average, seasonal index =
    per-day-of-week mean of the detrended series — the additive
    STL-lite every ops dashboard runs. Parity: daily totals are exact
    cents (quantized BEFORE summation), the MA window sums are exact
    BIGINT, the detrend is one division + one subtraction + one
    round to milli-cents, and day-of-week comes from days%7 epoch
    arithmetic (engine dayofweek() conventions differ). The windows
    run over the DISTINCT-DATE table — structurally bounded by the
    calendar, the auc_score/kaplan_meier precedent."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v")
    )
    days = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    base = daily.select(days.cast("long").alias("days"), "v")
    w = Window.orderBy("days").rowsBetween(-3, 3)
    det = base.select(
        (F.col("days") % 7).alias("dow"),
        F.round(
            (
                F.col("v")
                - F.sum("v").over(w) / F.count("v").over(w)
            )
            * F.lit(1000.0)
        )
        .cast("long")
        .alias("d_milli"),
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.sum("d_milli") / F.count("*"))
            .cast("long")
            .alias("seasonal_milli"),
        )
        .orderBy("dow")
    )


ORACLE_SEASONAL_DOW = """
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
base AS MATERIALIZED (
  SELECT DATE_DIFF('day', DATE '1970-01-01', d) AS days, v FROM daily
),
det AS MATERIALIZED (
  SELECT days % 7 AS dow,
         CAST(ROUND((v - SUM(v) OVER win / COUNT(v) OVER win) * 1000)
              AS BIGINT) AS d_milli
  FROM base
  WINDOW win AS (ORDER BY days ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(ROUND(SUM(d_milli) / COUNT(*)) AS BIGINT) AS seasonal_milli
FROM det GROUP BY dow ORDER BY dow
"""


EXTRA_QUERIES.update(
    {
        "seasonal_decompose_dow": (
            q_seasonal_decompose_dow,
            ORACLE_SEASONAL_DOW,
            "ext:additive seasonal decomposition (centered MA + dow index)",
        ),
    }
)


# --------------------------------------------------------------------------
# Two-proportion A/B z-test (experiment-analysis surface)
# --------------------------------------------------------------------------


def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a hash-assigned experiment: users
    split into A/B by the portable hash's parity (deterministic,
    covariate-independent — exactly how production bucketing works),
    conversion = the user is a heavy purchaser. Reports per-variant rates
    and the pooled z statistic — the basic experiment readout every
    event pipeline serves. Counts are exact BIGINT; rates and z are
    fixed single-expression trees rounded to 6 (z = (p̂_a − p̂_b) /
    √(p̂(1−p̂)(1/n_a + 1/n_b)) with pooled p̂)."""
    from yelp_etl_spark.functions.sampling import hash60

    events = _t(spark, sf_dir, "events")
    # conversion = a heavy purchaser (≥ 12 purchases): every fixture
    # user purchases at least once, so the binary any-purchase metric
    # is degenerate (rate 1.0 in both arms, z undefined)
    per_user = events.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) >= 12
        ).cast("long").alias("conv")
    )
    assigned = per_user.select(
        (hash60(F.concat(F.lit("ab1-"), F.col("user_id"))) % 2).alias(
            "variant"
        ),
        "conv",
    )
    cells = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    wide = (
        cells.groupBy()
        .pivot("variant", [0, 1])
        .agg(F.first("n").alias("n"), F.first("k").alias("k"))
        .select(
            F.col("0_n").alias("n_a"),
            F.col("0_k").alias("k_a"),
            F.col("1_n").alias("n_b"),
            F.col("1_k").alias("k_b"),
        )
    )
    pa = F.col("k_a") / F.col("n_a")
    pb = F.col("k_b") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")) / (F.col("n_a") + F.col("n_b"))
    z = (pa - pb) / F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("k_a").cast("long").alias("k_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("k_b").cast("long").alias("k_b"),
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


ORACLE_AB_TEST = """
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 12 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
),
assigned AS MATERIALIZED (
  SELECT CAST(concat('0x', substr(md5(CAST(concat('ab1-', user_id)
                                           AS VARCHAR)), 18, 15)) AS BIGINT)
           % 2 AS variant,
         conv
  FROM per_user
),
wide AS (
  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS k_a,
         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS k_b
  FROM assigned
)
SELECT n_a, k_a, n_b, k_b,
       ROUND(k_a / n_a, 6) AS rate_a,
       ROUND(k_b / n_b, 6) AS rate_b,
       ROUND((k_a / n_a - k_b / n_b)
             / SQRT((k_a + k_b) / (n_a + n_b)
                    * (CAST(1.0 AS DOUBLE) - (k_a + k_b) / (n_a + n_b))
                    * (CAST(1.0 AS DOUBLE) / n_a
                       + CAST(1.0 AS DOUBLE) / n_b)), 6) AS z_stat
FROM wide
"""


EXTRA_QUERIES.update(
    {
        "ab_test_ztest": (
            q_ab_test_ztest,
            ORACLE_AB_TEST,
            "ext:two-proportion z-test (hash-bucketed experiment readout)",
        ),
    }
)


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median per group (revenue-weighted order
    quantity by return flag): reduce to per-(group, value) weight
    cells — bounded by the value domain, quantity ∈ 1..50 — then one
    cumulative window over that small table picks the first value
    whose running weight reaches half the total. The exact complement
    of the approximate histogram quantiles: same two-level shape, no
    error bound, valid whenever the value domain is bounded. Weights
    are exact cents; the half-total comparison is integer (2·cum ≥
    total avoids the division entirely)."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("v"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "w"
        )
    )
    win = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("g")
    stepped = cells.withColumn("cum", F.sum("w").over(win)).withColumn(
        "total", F.sum("w").over(tot)
    )
    return (
        stepped.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("g")
        .agg(F.min("v").cast("long").alias("weighted_median_qty"))
        .orderBy("g")
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH cells AS MATERIALIZED (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS w
  FROM lineitem GROUP BY 1, 2
),
stepped AS (
  SELECT g, v,
         SUM(w) OVER (PARTITION BY g ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY g) AS total
  FROM cells
)
SELECT g, CAST(MIN(v) AS BIGINT) AS weighted_median_qty
FROM stepped WHERE 2 * cum >= total
GROUP BY g ORDER BY g
"""


EXTRA_QUERIES.update(
    {
        "weighted_median": (
            q_weighted_median,
            ORACLE_WEIGHTED_MEDIAN,
            "ext:exact weighted median (bounded value domain, integer compare)",
        ),
    }
)


# --------------------------------------------------------------------------
# Two-sample rank statistics over a bounded value domain
# --------------------------------------------------------------------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing l_quantity between
    return flags A and N — the nonparametric complement to
    ab_test_ztest. Counting form: 2·U_A = Σ_v c_A(v)·(2·F_B(v⁻) +
    c_B(v)) over the value histogram, exact BIGINT (each A-observation
    beats every smaller B and half-credits ties). The z-score uses the
    tie-corrected normal variance, computed in double from the exact
    integer moments and quantized to micro-units. Scale: everything
    reduces to the ≤50-row quantity histogram after ONE keyed count;
    the cumulative window runs over that bounded table only (the
    weighted_median / auc_score precedent)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
    )
    # FLOOR, not cast: Spark's long cast truncates where DuckDB's
    # rounds (the q_sssp_weighted convention for fractional quantities)
    cells = li.groupBy(F.floor("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    stepped = cells.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).alias("cumb"),
    )
    # tie cubes go through decimal(38,0): per-cell counts grow linearly
    # with data volume and their CUBES overflow int64 around SF≈6 —
    # decimal keeps the sum exact (and partition-order independent,
    # unlike a double sum) to ~1e38
    t_dec = (F.col("ca") + F.col("cb")).cast("decimal(38,0)")
    agg = stepped.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cumb") + F.col("cb")))
        .cast("long")
        .alias("u2x"),
        F.sum(t_dec * t_dec * t_dec - t_dec)
        .cast("double")
        .alias("tie_cubes"),
    )
    n = F.col("n_a") + F.col("n_b")
    mu2x = F.col("n_a") * F.col("n_b")  # 2·μ_U = n_a·n_b
    var = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("tie_cubes") / (n * (n - F.lit(1))))
    )
    z = (F.col("u2x") - mu2x) / (F.lit(2.0) * F.sqrt(var))
    return agg.select(
        "n_a",
        "n_b",
        "u2x",
        F.round(z * F.lit(1_000_000.0)).cast("long").alias("z_micro"),
    )


ORACLE_MANN_WHITNEY_U = """
WITH cells AS MATERIALIZED (
  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1
),
stepped AS (
  SELECT v, ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cumb
  FROM cells
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(SUM(ca * (2 * cumb + cb)) AS BIGINT) AS u2x,
         CAST(SUM(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
                  - (ca + cb)) AS DOUBLE) AS tie_cubes
  FROM stepped
)
SELECT n_a, n_b, u2x,
       CAST(ROUND((u2x - n_a * n_b)
                  / (CAST(2.0 AS DOUBLE) * SQRT(
                       CAST(n_a AS DOUBLE) * n_b / 12.0
                       * ((n_a + n_b + 1)
                          - tie_cubes / (CAST(n_a + n_b AS DOUBLE)
                                         * (n_a + n_b - 1)))))
                  * 1000000) AS BIGINT) AS z_micro
FROM agg
"""


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the
    l_quantity distributions of return flags A and N — the
    distribution-drift detector that complements psi_drift (PSI needs
    binning choices; KS is binning-free). D is kept as the exact
    integer cross-product max |F_A·n_A·n_B − F_B·n_A·n_B| =
    max |cuma·n_b − cumb·n_a| (BIGINT — no float ECDFs), with d_ppm
    and the asymptotic statistic λ = D·√(n_a·n_b/(n_a+n_b)) derived
    from it. Same bounded-histogram shape as mann_whitney_u: one
    keyed count, then windows over ≤50 rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
    )
    # FLOOR, not cast (the q_sssp_weighted truncate-vs-round convention)
    cells = li.groupBy(F.floor("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    stepped = cells.select(
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    # ECDF cross-products through decimal(38,0): cuma·tb reaches n²
    # even when D is tiny, which leaves int64 around SF≈400 — the
    # decimal keeps every intermediate exact; d_scaled itself (D·n²)
    # converts back to BIGINT, loudly if the answer ever outgrows it
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = stepped.agg(
        F.max("cuma").cast("long").alias("n_a"),
        F.max("cumb").cast("long").alias("n_b"),
    ).crossJoin(
        stepped.crossJoin(
            cells.agg(
                F.sum("ca").cast("decimal(38,0)").alias("ta"),
                F.sum("cb").cast("decimal(38,0)").alias("tb"),
            )
        )
        .select(
            F.abs(dec("cuma") * F.col("tb") - dec("cumb") * F.col("ta"))
            .alias("dd")
        )
        .agg(F.max("dd").cast("long").alias("d_scaled"))
    )
    nn = F.col("n_a").cast("double") * F.col("n_b")
    return agg.select(
        "n_a",
        "n_b",
        "d_scaled",
        F.round(F.col("d_scaled") / nn * F.lit(1_000_000.0))
        .cast("long")
        .alias("d_ppm"),
        F.round(
            F.col("d_scaled")
            / nn
            * F.sqrt(nn / (F.col("n_a") + F.col("n_b")))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("lambda_micro"),
    )


ORACLE_KS_TWO_SAMPLE = """
WITH cells AS MATERIALIZED (
  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb
  FROM cells
),
stepped AS (
  SELECT CAST(SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cuma,
         CAST(SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cumb
  FROM cells
),
dmax AS (
  SELECT CAST(MAX(ABS(CAST(cuma AS HUGEINT) * tb
                      - CAST(cumb AS HUGEINT) * ta)) AS BIGINT) AS d_scaled
  FROM stepped, tot
)
SELECT ta AS n_a, tb AS n_b, d_scaled,
       CAST(ROUND(d_scaled / (CAST(ta AS DOUBLE) * tb) * 1000000) AS BIGINT)
         AS d_ppm,
       CAST(ROUND(d_scaled / (CAST(ta AS DOUBLE) * tb)
                  * SQRT(CAST(ta AS DOUBLE) * tb / (ta + tb))
                  * 1000000) AS BIGINT) AS lambda_micro
FROM dmax, tot
"""


EXTRA_QUERIES.update(
    {
        "mann_whitney_u": (
            q_mann_whitney_u,
            ORACLE_MANN_WHITNEY_U,
            "ext:Mann-Whitney rank-sum test (exact 2U counting form, tie-corrected z)",
        ),
        "ks_two_sample": (
            q_ks_two_sample,
            ORACLE_KS_TWO_SAMPLE,
            "ext:exact two-sample KS distance (integer cross-product ECDFs)",
        ),
    }
)


# --------------------------------------------------------------------------
# Theil-Sen robust trend slope (median of pairwise slopes)
# --------------------------------------------------------------------------


def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (Sen 1968) of the 1995 daily-revenue trend:
    the median of all pairwise slopes (y_j−y_i)/(d_j−d_i) — the
    robust-regression complement to zipf_slope's OLS (up to ~29%
    outlier days cannot move it). Slopes quantize to exact
    micro-cents/day via the repo's portable floor (truncating div
    minus the negative-remainder correction — identical in DuckDB),
    then the median is the count-based lower median over the slope
    histogram (the weighted_median machinery). Scale: ONE keyed agg
    reduces everything to the ≤365-row day table; the pair join and
    the median window run over calendar-bounded frames (≤66k pairs)
    that never grow with data volume."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    a = days.alias("a")
    b = days.alias("b")
    dy = F.col("b.y") - F.col("a.y")
    dd = F.datediff(F.col("b.d"), F.col("a.d"))
    pairs = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .select(dy.alias("dy"), dd.cast("long").alias("dd"))
        .select(
            # 1e6*dy through decimal(38,0): BIGINT day-revenue deltas
            # overflow int64 under the 1e6 quantizer at SF≈1000+ daily
            # volumes — same discipline as the rank-test tie cubes
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * dy) div dd AS BIGINT)"
                " - (CASE WHEN (CAST(1000000 AS DECIMAL(38,0)) * dy) % dd"
                " != 0 AND dy < 0 THEN 1 ELSE 0 END)"
            ).alias("qs")
        )
    )
    counts = pairs.groupBy("qs").agg(F.count("*").alias("c"))
    w = Window.orderBy("qs").rowsBetween(Window.unboundedPreceding, 0)
    stepped = counts.select(
        "qs",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    med = stepped.filter(2 * F.col("cum") >= F.col("total")).agg(
        F.min("qs").cast("long").alias("slope_micro_cents_per_day"),
        F.min("total").cast("long").alias("n_pairs"),
    )
    return med.crossJoin(
        days.agg(F.count("*").cast("long").alias("n_days"))
    ).select("n_days", "n_pairs", "slope_micro_cents_per_day")


ORACLE_THEIL_SEN_SLOPE = """
WITH days AS MATERIALIZED (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
pairs AS MATERIALIZED (
  SELECT CAST((CAST(1000000 AS HUGEINT) * (b.y - a.y))
              // date_diff('day', a.d, b.d) AS BIGINT)
         - (CASE WHEN (CAST(1000000 AS HUGEINT) * (b.y - a.y))
                      % date_diff('day', a.d, b.d) != 0
                 AND b.y - a.y < 0 THEN 1 ELSE 0 END) AS qs
  FROM days a JOIN days b ON a.d < b.d
),
counts AS (
  SELECT qs, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY 1
),
stepped AS (
  SELECT qs,
         CAST(SUM(c) OVER (ORDER BY qs ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS total
  FROM counts
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM days) AS n_days,
       CAST(MIN(total) AS BIGINT) AS n_pairs,
       CAST(MIN(qs) AS BIGINT) AS slope_micro_cents_per_day
FROM stepped WHERE 2 * cum >= total
"""


EXTRA_QUERIES.update(
    {
        "theil_sen_slope": (
            q_theil_sen_slope,
            ORACLE_THEIL_SEN_SLOPE,
            "ext:Theil-Sen robust trend (median pairwise slope, calendar-bounded)",
        ),
    }
)


# --------------------------------------------------------------------------
# Multi-feature OLS by exact normal equations (closed-form Cramer solve)
# --------------------------------------------------------------------------


def q_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature + intercept least squares fitted the way a 100 TB
    regression actually runs: ONE distributed pass accumulates the 10
    sufficient moments (n, Σx, Σxx, Σxy, Σyy) EXACTLY — per-row
    products in BIGINT, sums in decimal(38) so no scale overflows —
    then the 3×3 normal equations solve in closed form (Cramer) on
    the 1-row moment frame. Extends regr_aggs' single-feature
    surface to the multivariate case logreg/gbt don't cover (those
    are iterative; this is the exact one-pass path). Fit: lineitem
    extendedprice from quantity and part retailprice — the TPC-H
    pricing identity, so R² lands near 1 and the weights are
    interpretable. The solve arithmetic is written with the identical
    expression tree in the DuckDB oracle (doubles from exact
    integers), weights quantized to micro-units."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("x2"),
    )
    rows = li.join(part, li.l_partkey == part.p_partkey).select(
        "x1", "x2", "y"
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = rows.agg(
        F.count("*").cast("double").alias("n"),
        dec(F.col("x1")).alias("s1"),
        dec(F.col("x2")).alias("s2"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x1") * F.col("x1")).alias("s11"),
        dec(F.col("x2") * F.col("x2")).alias("s22"),
        dec(F.col("x1") * F.col("x2")).alias("s12"),
        dec(F.col("x1") * F.col("y")).alias("s1y"),
        dec(F.col("x2") * F.col("y")).alias("s2y"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    )
    # Cramer's rule on the symmetric 3×3 system; expression trees kept
    # 1:1 with the oracle so the IEEE evaluation is identical
    det = (
        "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s12 - s11 * s2))"
    )
    d0 = (
        "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
        "+ s2 * (s1y * s12 - s11 * s2y))"
    )
    d1 = (
        "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s2y - s1y * s2))"
    )
    d2 = (
        "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) "
        "+ sy * (s1 * s12 - s11 * s2))"
    )
    sel = m.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        f"{d0} / {det} AS w0",
        f"{d1} / {det} AS w1",
        f"{d2} / {det} AS w2",
        "sy",
        "s1y",
        "s2y",
        "syy",
        "n",
    )
    sse = "(syy - w0 * sy - w1 * s1y - w2 * s2y)"
    sst = "(syy - sy * sy / n)"
    return sel.selectExpr(
        "n_rows",
        "CAST(ROUND(w0 * 1000000) AS BIGINT) AS w0_micro",
        "CAST(ROUND(w1 * 1000000) AS BIGINT) AS w1_micro",
        "CAST(ROUND(w2 * 1000000) AS BIGINT) AS w2_micro",
        f"CAST(ROUND((1.0 - {sse} / {sst}) * 1000000) AS BIGINT) AS r2_ppm",
    )


ORACLE_OLS_NORMAL_EQUATIONS = """
WITH rows_ AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS x1,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
         CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
         CAST(SUM(x2 * y) AS DOUBLE) AS s2y,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM rows_
),
sol AS (
  SELECT CAST(n AS BIGINT) AS n_rows,
         (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y))
         / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)) AS w0,
         (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2))
         / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)) AS w1,
         (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2))
         / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)) AS w2,
         sy, s1y, s2y, syy, n
  FROM m
)
SELECT n_rows,
       CAST(ROUND(w0 * 1000000) AS BIGINT) AS w0_micro,
       CAST(ROUND(w1 * 1000000) AS BIGINT) AS w1_micro,
       CAST(ROUND(w2 * 1000000) AS BIGINT) AS w2_micro,
       CAST(ROUND((1.0 - (syy - w0 * sy - w1 * s1y - w2 * s2y)
                         / (syy - sy * sy / n)) * 1000000) AS BIGINT)
         AS r2_ppm
FROM sol
"""


EXTRA_QUERIES.update(
    {
        "ols_normal_equations": (
            q_ols_normal_equations,
            ORACLE_OLS_NORMAL_EQUATIONS,
            "ext:two-feature OLS via exact decimal moments + Cramer solve",
        ),
    }
)


# --------------------------------------------------------------------------
# Difference-in-differences estimator (causal surface)
# --------------------------------------------------------------------------


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical 2×2 difference-in-differences: treatment = BUILDING-
    segment customers, control = MACHINERY, pre = 1994 orders, post =
    1995; outcome = mean order value. DiD = (ȳ_T,post − ȳ_T,pre) −
    (ȳ_C,post − ȳ_C,pre) — the workhorse causal estimator for
    launch/rollout effects, reduced to ONE grouped aggregation over
    exact cent sums (4 cells), with the estimate assembled from the
    cell moments in double and quantized to micro-cents. (Point
    estimate only — clustered standard errors are a bootstrap on top
    of the same cells.) Scale: one map-side-combinable 4-cell agg."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    cells = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .filter(F.year("o_orderdate").isin(1994, 1995))
        .groupBy(
            (F.col("c_mktsegment") == "BUILDING").alias("treated"),
            (F.year("o_orderdate") == 1995).alias("post"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    pivot = cells.agg(
        *[
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col("cents").cast("double") / F.col("n"),
                ).otherwise(0.0)
            ).alias(name)
            for name, t, p in [
                ("y_t_pre", True, False),
                ("y_t_post", True, True),
                ("y_c_pre", False, False),
                ("y_c_post", False, True),
            ]
        ],
        F.sum("n").cast("long").alias("n_orders"),
    )
    micro = lambda c: F.round(F.col(c) * 10_000).cast("long")  # noqa: E731
    return pivot.select(
        "n_orders",
        micro("y_t_pre").alias("y_t_pre_microd"),
        micro("y_t_post").alias("y_t_post_microd"),
        micro("y_c_pre").alias("y_c_pre_microd"),
        micro("y_c_post").alias("y_c_post_microd"),
        F.round(
            (
                (F.col("y_t_post") - F.col("y_t_pre"))
                - (F.col("y_c_post") - F.col("y_c_pre"))
            )
            * 10_000
        )
        .cast("long")
        .alias("did_microd"),
    )


ORACLE_DIFF_IN_DIFF = """
WITH cells AS MATERIALIZED (
  SELECT (c_mktsegment = 'BUILDING') AS treated,
         (EXTRACT(YEAR FROM o_orderdate) = 1995) AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    AND EXTRACT(YEAR FROM o_orderdate) IN (1994, 1995)
  GROUP BY 1, 2
),
agg4 AS (
  SELECT
    SUM(CASE WHEN treated AND NOT post
             THEN CAST(cents AS DOUBLE) / n ELSE 0.0 END) AS y_t_pre,
    SUM(CASE WHEN treated AND post
             THEN CAST(cents AS DOUBLE) / n ELSE 0.0 END) AS y_t_post,
    SUM(CASE WHEN NOT treated AND NOT post
             THEN CAST(cents AS DOUBLE) / n ELSE 0.0 END) AS y_c_pre,
    SUM(CASE WHEN NOT treated AND post
             THEN CAST(cents AS DOUBLE) / n ELSE 0.0 END) AS y_c_post,
    CAST(SUM(n) AS BIGINT) AS n_orders
  FROM cells
)
SELECT n_orders,
       CAST(ROUND(y_t_pre * 10000) AS BIGINT) AS y_t_pre_microd,
       CAST(ROUND(y_t_post * 10000) AS BIGINT) AS y_t_post_microd,
       CAST(ROUND(y_c_pre * 10000) AS BIGINT) AS y_c_pre_microd,
       CAST(ROUND(y_c_post * 10000) AS BIGINT) AS y_c_post_microd,
       CAST(ROUND(((y_t_post - y_t_pre) - (y_c_post - y_c_pre)) * 10000)
            AS BIGINT) AS did_microd
FROM agg4
"""


EXTRA_QUERIES.update(
    {
        "diff_in_diff": (
            q_diff_in_diff,
            ORACLE_DIFF_IN_DIFF,
            "ext:2x2 difference-in-differences from exact cent cells",
        ),
    }
)


def q_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (Mantel-Haenszel) — the hypothesis
    test completing the survival triad (kaplan_meier estimates,
    nelson_aalen hazards, log-rank COMPARES): do heavy users (ever
    purchased) churn on a different schedule than the rest? Same
    duration/censor derivation as q_kaplan_meier; groups by purchase
    history. At each distinct duration t: observed group-1 events
    d1_t vs expectation d_t·n1_t/n_t under H0, variance
    d_t·n1_t·(n_t−n1_t)·(n_t−d_t) / (n_t²·(n_t−1)). The statistic is
    reported as chi² = (O1−E1)²/V in micro-units with every division
    deferred: per-term expectations/variances quantize via
    decimal(38,0) cross products, and the final ratio is one integer
    division — no sqrt, no float accumulation. Scale: everything
    reduces to the distinct-duration table (≤ horizon days) after one
    keyed agg; the windows run on that bounded frame."""
    events = _t(spark, sf_dir, "events")
    horizon = events.agg(F.max("ts").alias("max_ts"))
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.max((F.col("event_type") == "purchase").cast("long")).alias("g"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("t"),
            (F.col("last_ts") < F.col("max_ts") - F.expr("INTERVAL 3 DAYS"))
            .cast("long")
            .alias("churned"),
            "g",
        )
    )
    by_t = per_user.groupBy(F.col("t").cast("long").alias("t")).agg(
        F.count("*").alias("n_end"),
        F.sum(F.col("g")).alias("n_end1"),
        F.sum("churned").alias("d"),
        F.sum(F.col("churned") * F.col("g")).alias("d1"),
    )
    tot = by_t.agg(
        F.sum("n_end").alias("n_total"), F.sum("n_end1").alias("n1_total")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    stepped = by_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d1",
        (F.col("n_total") - (F.sum("n_end").over(w) - F.col("n_end")))
        .alias("n"),
        (F.col("n1_total") - (F.sum("n_end1").over(w) - F.col("n_end1")))
        .alias("n1"),
    ).filter((F.col("d") > 0) & (F.col("n") > 1))
    terms = stepped.select(
        "d1",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * d * n1) div n AS BIGINT)"
        ).alias("e1_micro"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * d * n1 * (n - n1)"
            " * (n - d)) div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
            " AS BIGINT)"
        ).alias("v_micro"),
    )
    s = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_micro").cast("long").alias("e1_micro"),
        F.sum("v_micro").cast("long").alias("v_micro"),
    )
    return s.select(
        "o1",
        "e1_micro",
        "v_micro",
        # chi2 = (O1 - E1)^2 / V, all micro-deferred:
        # ((1e6*O1 - e1u)^2) div (1e6 * vu)
        F.expr(
            "CAST(((CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_micro)"
            " * (CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_micro))"
            " div (CAST(1000000 AS DECIMAL(38,0)) * v_micro) AS BIGINT)"
        ).alias("chi2_micro"),
    )


ORACLE_LOG_RANK_TEST = """
WITH horizon AS MATERIALIZED (SELECT MAX(ts) AS max_ts FROM events),
per_user AS MATERIALIZED (
  SELECT date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t,
         CASE WHEN MAX(ts) < h.max_ts - INTERVAL 3 DAY THEN 1 ELSE 0 END
           AS churned,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g
  FROM events CROSS JOIN horizon h
  GROUP BY user_id, h.max_ts
),
by_t AS MATERIALIZED (
  SELECT CAST(t AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n_end,
         CAST(SUM(g) AS BIGINT) AS n_end1,
         CAST(SUM(churned) AS BIGINT) AS d,
         CAST(SUM(churned * g) AS BIGINT) AS d1
  FROM per_user GROUP BY t
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(n_end) AS BIGINT) AS n_total,
         CAST(SUM(n_end1) AS BIGINT) AS n1_total
  FROM by_t
),
stepped AS MATERIALIZED (
  SELECT t, d, d1,
         CAST(n_total - (SUM(n_end) OVER w - n_end) AS BIGINT) AS n,
         CAST(n1_total - (SUM(n_end1) OVER w - n_end1) AS BIGINT) AS n1
  FROM by_t CROSS JOIN tot
  WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
),
terms AS (
  SELECT d1,
         CAST((CAST(1000000 AS HUGEINT) * d * n1) // n AS BIGINT) AS e1_micro,
         CAST((CAST(1000000 AS HUGEINT) * d * n1 * (n - n1) * (n - d))
              // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT) AS v_micro
  FROM stepped WHERE d > 0 AND n > 1
),
s AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(e1_micro) AS BIGINT) AS e1_micro,
         CAST(SUM(v_micro) AS BIGINT) AS v_micro
  FROM terms
)
SELECT o1, e1_micro, v_micro,
       CAST(((CAST(1000000 AS HUGEINT) * o1 - e1_micro)
             * (CAST(1000000 AS HUGEINT) * o1 - e1_micro))
            // (CAST(1000000 AS HUGEINT) * v_micro) AS BIGINT) AS chi2_micro
FROM s
"""


def q_ari_cluster_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) between two
    partitions of the customer base — the clustering-stability /
    segmentation-agreement metric (how much does the behavioral
    segmentation agree with the balance-band one, beyond chance?).
    Partitions: declared market segment vs fixed-width account-balance
    band (never ntile — rank ties are order-dependent). ARI is pure
    pair-counting combinatorics: Σ C(n_ij,2) over the contingency
    table vs its chance expectation — all exact BIGINT (C(n,2) =
    n(n-1)/2), one final deferred division to micro-units via
    decimal(38,0). Scale: one (a,b)-keyed agg builds the contingency
    table (|segments|×|bands| ≤ 40 cells); constant after."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("a"),
        F.expr(
            "least(CAST(7 AS BIGINT), CAST(ROUND((c_acctbal + 1000) * 100)"
            " AS BIGINT) div 170000)"
        ).alias("b"),
    )
    cells = c.groupBy("a", "b").agg(F.count("*").alias("nij"))
    sums = cells.agg(
        F.sum(F.expr("nij * (nij - 1) div 2")).alias("s_cells"),
        F.sum("nij").alias("n"),
    )
    sa = (
        cells.groupBy("a")
        .agg(F.sum("nij").alias("na"))
        .agg(F.sum(F.expr("na * (na - 1) div 2")).alias("s_a"))
    )
    sb = (
        cells.groupBy("b")
        .agg(F.sum("nij").alias("nb"))
        .agg(F.sum(F.expr("nb * (nb - 1) div 2")).alias("s_b"))
    )
    # ARI = (S - SaSb/T) / ((Sa+Sb)/2 - SaSb/T), T = C(n,2); defer ALL
    # divisions: num = T*S - Sa*Sb, den = T*(Sa+Sb)/2 - Sa*Sb
    return (
        sums.crossJoin(sa)
        .crossJoin(sb)
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("s_cells").cast("long").alias("s_cells"),
            F.col("s_a").cast("long").alias("s_a"),
            F.col("s_b").cast("long").alias("s_b"),
            # ARI = (T·S − SaSb) / (T·(Sa+Sb)/2 − SaSb) with T=C(n,2).
            # Substituting M = n(n−1) = 2T and clearing denominators:
            # ari = (2·M·S − 4·SaSb) / (M·(Sa+Sb) − 4·SaSb) — NO interior
            # division at all, so every term stays a decimal(38,0)
            # product (a `div 2` midway would collapse to int64 — Spark's
            # IntegralDivide returns LONG — and the following product
            # overflows already at ~1M rows). Pair counts scale as n²
            # and the cleared numerator as n⁴ in the all-one-cluster
            # worst case: decimal38/HUGEINT headroom holds to n ≈ 1e8
            # rows — past that, compute ARI on a group-keyed sample.
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(2 AS DECIMAL(38,0)) * n * (n - 1) * s_cells"
                "    - CAST(4 AS DECIMAL(38,0)) * s_a * s_b))"
                " div (CAST(n AS DECIMAL(38,0)) * (n - 1) * (s_a + s_b)"
                "      - CAST(4 AS DECIMAL(38,0)) * s_a * s_b) AS BIGINT)"
            ).alias("ari_micro"),
        )
    )


ORACLE_ARI_CLUSTER_AGREEMENT = """
WITH c AS MATERIALIZED (
  SELECT c_mktsegment AS a,
         LEAST(7, CAST(ROUND((c_acctbal + 1000) * 100) AS BIGINT) // 170000)
           AS b
  FROM customer
),
cells AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nij FROM c GROUP BY a, b
),
sums AS (
  SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS s_cells,
         CAST(SUM(nij) AS BIGINT) AS n
  FROM cells
),
sa AS (
  SELECT CAST(SUM(na * (na - 1) // 2) AS BIGINT) AS s_a FROM (
    SELECT CAST(SUM(nij) AS BIGINT) AS na FROM cells GROUP BY a
  )
),
sb AS (
  SELECT CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS s_b FROM (
    SELECT CAST(SUM(nij) AS BIGINT) AS nb FROM cells GROUP BY b
  )
)
SELECT n, s_cells, s_a, s_b,
       CAST((CAST(1000000 AS HUGEINT)
             * (CAST(2 AS HUGEINT) * n * (n - 1) * s_cells
                - CAST(4 AS HUGEINT) * s_a * s_b))
            // (CAST(n AS HUGEINT) * (n - 1) * (s_a + s_b)
                - CAST(4 AS HUGEINT) * s_a * s_b) AS BIGINT) AS ari_micro
FROM sums CROSS JOIN sa CROSS JOIN sb
"""


def q_anova_f_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic — does mean account balance differ
    across market segments? The continuous-feature complement of
    chi2_terms (categorical) and mi_terms (information). Moments stay
    exact: per-group sums in BIGINT cents, sums of squares in
    decimal(38,0); the between/within decomposition A = Σ s_g²/n_g
    floors each group term at UNIT (cents²) scale — a ±1 floor on a
    ~1e12 term, identical on both engines by the portable-div
    convention, so SSB/SSW are exact integers on both sides (emitted
    as strings: they exceed int64 at large SF and the driver hasher
    can't round-trip int128). The F ratio itself is ONE division of
    those identical integers, done in double and rounded — Spark's
    IntegralDivide returns int64, so a fully-deferred integer F would
    overflow exactly at the scale this query is meant for. Scale: one
    map-side-combinable keyed agg to k=5 moment rows; constant
    after."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
    )
    grp = c.groupBy("g").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("qg"),
    )
    t = grp.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(F.col("sg").cast("decimal(38,0)")).alias("s"),
        F.sum("qg").alias("q"),
        # Σ floor(s_g²/n_g) exactly: p - (p % ng) is divisible, the
        # decimal / stays exact, never through int64
        F.sum(
            F.expr(
                "(CAST(sg AS DECIMAL(38,0)) * sg"
                " - (CAST(sg AS DECIMAL(38,0)) * sg) % ng) / ng"
            ).cast("decimal(38,0)")
        ).alias("a_unit"),
    )
    ssb = F.expr("a_unit - (s * s - (s * s) % n) / n").cast("decimal(38,0)")
    ssw = F.expr("q - a_unit").cast("decimal(38,0)")
    return t.select(
        "k",
        "n",
        ssb.cast("string").alias("ssb_unit"),
        ssw.cast("string").alias("ssw_unit"),
        F.round(
            ssb.cast("double")
            * (F.col("n") - F.col("k")).cast("double")
            / (ssw.cast("double") * (F.col("k") - 1).cast("double")),
            6,
        ).alias("f_stat"),
    )


ORACLE_ANOVA_F_TEST = """
WITH c AS MATERIALIZED (
  SELECT c_mktsegment AS g, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x
  FROM customer
),
grp AS MATERIALIZED (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(x) AS BIGINT) AS sg,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
  FROM c GROUP BY g
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(sg AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(qg) AS HUGEINT) AS q,
         CAST(SUM((CAST(sg AS HUGEINT) * sg) // ng) AS HUGEINT) AS a_unit
  FROM grp
),
d AS (
  SELECT k, n,
         a_unit - (s * s) // n AS ssb,
         q - a_unit AS ssw
  FROM t
)
SELECT k, n,
       CAST(ssb AS VARCHAR) AS ssb_unit,
       CAST(ssw AS VARCHAR) AS ssw_unit,
       ROUND(CAST(ssb AS DOUBLE) * CAST(n - k AS DOUBLE)
             / (CAST(ssw AS DOUBLE) * CAST(k - 1 AS DOUBLE)), 6) AS f_stat
FROM d
"""


EXTRA_QUERIES.update(
    {
        "log_rank_test": (
            q_log_rank_test,
            ORACLE_LOG_RANK_TEST,
            "ext:two-sample log-rank survival test (deferred-division chi2)",
        ),
        "ari_cluster_agreement": (
            q_ari_cluster_agreement,
            ORACLE_ARI_CLUSTER_AGREEMENT,
            "ext:Adjusted Rand Index between two partitions (exact pair counting)",
        ),
        "anova_f_test": (
            q_anova_f_test,
            ORACLE_ANOVA_F_TEST,
            "ext:one-way ANOVA F from exact integer moments",
        ),
    }
)


def q_changepoint_binary_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection by binary segmentation (the first split of
    Scott & Knott / the PELT family's building block) over the 1995
    daily-revenue series — the LOCATION estimator complementing
    cusum_top_days' drift score: pick the split that maximizes the
    between-segment sum of squares, equivalently maximizes
    S_L²/n_L + S_R²/n_R (prefix-sum identity; total SS is
    split-invariant). Gains floor at unit (cents²) scale inside
    decimal(38,0) — both engines floor identically — and the argmax is
    a max_by with the earliest-day tie-break, so the chosen changepoint
    replays bit-identically. Scale: one map-side-combinable groupBy to
    the ≤365-row day table; the candidate sweep is two windows over
    that bounded frame."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pref = days.select(
        "d",
        F.sum("y").over(w).alias("sl"),
        F.count("*").over(w).cast("long").alias("nl"),
    )
    tot = days.agg(
        F.sum("y").cast("long").alias("s"), F.count("*").cast("long").alias("n")
    )
    cand = pref.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("n"))
    gains = cand.select(
        "d",
        "nl",
        F.expr(
            "CAST((CAST(sl AS DECIMAL(38,0)) * sl"
            " - (CAST(sl AS DECIMAL(38,0)) * sl) % nl) / nl"
            " + (CAST(s - sl AS DECIMAL(38,0)) * (s - sl)"
            "    - (CAST(s - sl AS DECIMAL(38,0)) * (s - sl)) % (n - nl))"
            "   / (n - nl) AS DECIMAL(38,0))"
        ).alias("gain"),
    )
    # portable argmax: rank by (gain desc, d asc) over the bounded
    # candidate frame and keep row 1 (a bare max_by has no defined
    # tie-break to pin across engines)
    wr = Window.orderBy(F.desc("gain"), "d")
    top = gains.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") == 1
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("changepoint_after"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).cast("long").alias("n_right"),
        F.col("gain").cast("string").alias("gain_unit"),
    )


ORACLE_CHANGEPOINT_BINARY_SEG = """
WITH days AS MATERIALIZED (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
pref AS MATERIALIZED (
  SELECT d,
         CAST(SUM(y) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS sl,
         CAST(COUNT(*) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS nl
  FROM days
),
tot AS (
  SELECT CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n FROM days
),
gains AS (
  SELECT d, nl,
         (CAST(sl AS HUGEINT) * sl) // nl
         + (CAST(s - sl AS HUGEINT) * (s - sl)) // (n - nl) AS gain
  FROM pref CROSS JOIN tot
  WHERE nl < n
),
top AS (
  SELECT d, nl, gain,
         ROW_NUMBER() OVER (ORDER BY gain DESC, d) AS rn
  FROM gains
)
SELECT t.d AS changepoint_after,
       t.nl AS n_left,
       CAST(x.n - t.nl AS BIGINT) AS n_right,
       CAST(t.gain AS VARCHAR) AS gain_unit
FROM top t CROSS JOIN tot x WHERE t.rn = 1
"""


EXTRA_QUERIES.update(
    {
        "changepoint_binary_seg": (
            q_changepoint_binary_seg,
            ORACLE_CHANGEPOINT_BINARY_SEG,
            "ext:binary-segmentation changepoint (exact integer gain argmax)",
        ),
    }
)


def q_cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based equi-join cardinality estimation (the AGMS/CMS
    inner-product bound, Alon et al. 1999 / Cormode-Muthukrishnan
    2005) — the query-optimizer capability behind join reordering at
    100 TB: |R ⋈_v S| = Σ_v f_R(v)·f_S(v) is upper-bounded by
    min_d Σ_pos cms_R[d,pos]·cms_S[d,pos], computable from two
    mergeable sketches WITHOUT touching raw rows again. Early vs late
    lineitem halves joined on partkey; the query returns the exact
    join size (per-key frequency join — the expensive ground truth),
    the sketch estimate, the guaranteed overestimate flag, and the
    relative error in micro-units. Sketch inner products route through
    decimal(38,0) (Σ f_R f_S can leave int64 at scale). Scale: sketch
    build is one map-side pass each; the inner product joins two
    ≤depth×width cell tables — constant cost."""
    from yelp_etl_spark.functions.sketches import count_min_sketch

    li = _t(spark, sf_dir, "lineitem")
    cut = "1995-06-17"
    early = li.filter(F.col("l_shipdate") < cut)
    late = li.filter(F.col("l_shipdate") >= cut)
    s1 = count_min_sketch(early, "l_partkey").withColumnRenamed("cnt", "c1")
    s2 = count_min_sketch(late, "l_partkey").withColumnRenamed("cnt", "c2")
    per_row = (
        s1.join(s2, ["d", "pos"])
        .groupBy("d")
        .agg(
            F.sum(F.col("c1").cast("decimal(38,0)") * F.col("c2")).alias("ip")
        )
    )
    est = per_row.agg(F.min("ip").cast("long").alias("est_join_size"))
    f1 = early.groupBy("l_partkey").agg(F.count("*").alias("f1"))
    f2 = late.groupBy("l_partkey").agg(F.count("*").alias("f2"))
    exact = (
        f1.join(f2, "l_partkey")
        .agg(
            F.sum(F.col("f1").cast("decimal(38,0)") * F.col("f2"))
            .cast("long")
            .alias("exact_join_size")
        )
    )
    return est.crossJoin(exact).select(
        "exact_join_size",
        "est_join_size",
        (F.col("est_join_size") >= F.col("exact_join_size")).alias(
            "overestimates"
        ),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (est_join_size - exact_join_size))"
            " div exact_join_size AS BIGINT)"
        ).alias("rel_err_micro"),
    )


def _cms_join_oracle() -> str:
    from yelp_etl_spark.functions.sketches import CMS_P, CMS_PERMS, CMS_WIDTH

    perms = ", ".join(f"({d}, {a}, {b})" for d, (a, b) in enumerate(CMS_PERMS))
    h = (
        "(CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 18, 15)) "
        f"AS BIGINT) & {CMS_P})"
    )
    return f"""
WITH perms(d, a, b) AS (VALUES {perms}),
c1 AS MATERIALIZED (
  SELECT p.d, ((p.a * {h} + p.b) % {CMS_P}) % {CMS_WIDTH} AS pos,
         CAST(COUNT(*) AS BIGINT) AS c1
  FROM lineitem, perms p WHERE l_shipdate < DATE '1995-06-17'
  GROUP BY 1, 2
),
c2 AS MATERIALIZED (
  SELECT p.d, ((p.a * {h} + p.b) % {CMS_P}) % {CMS_WIDTH} AS pos,
         CAST(COUNT(*) AS BIGINT) AS c2
  FROM lineitem, perms p WHERE l_shipdate >= DATE '1995-06-17'
  GROUP BY 1, 2
),
est AS (
  SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM (
    SELECT d, SUM(CAST(c1 AS HUGEINT) * c2) AS ip
    FROM c1 JOIN c2 USING (d, pos) GROUP BY d
  )
),
exact AS (
  SELECT CAST(SUM(CAST(f1 AS HUGEINT) * f2) AS BIGINT) AS exact_join_size
  FROM (SELECT l_partkey, COUNT(*) AS f1 FROM lineitem
        WHERE l_shipdate < DATE '1995-06-17' GROUP BY 1) a
  JOIN (SELECT l_partkey, COUNT(*) AS f2 FROM lineitem
        WHERE l_shipdate >= DATE '1995-06-17' GROUP BY 1) b
  USING (l_partkey)
)
SELECT exact_join_size, est_join_size,
       est_join_size >= exact_join_size AS overestimates,
       CAST((CAST(1000000 AS HUGEINT) * (est_join_size - exact_join_size))
            // exact_join_size AS BIGINT) AS rel_err_micro
FROM est CROSS JOIN exact
"""


ORACLE_CMS_JOIN_SIZE = _cms_join_oracle()


EXTRA_QUERIES.update(
    {
        "cms_join_size_estimate": (
            q_cms_join_size_estimate,
            ORACLE_CMS_JOIN_SIZE,
            "ext:AGMS/CMS join-cardinality estimate (sketch inner product)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round 9: classical-statistics pack — inter-rater agreement,
# categorical association, distribution comparison, rank correlation,
# concentration, trend. All exact-integer interior math (the ANOVA/ARI
# discipline), one rounded double division at the very end.
# --------------------------------------------------------------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic 'raters' over orders —
    inter-annotator agreement, the labeling-quality gate every
    LLM-training annotation pipeline runs before trusting a label
    column: rater A buckets by order priority, rater B by fixed
    total-price bands, shared label space {hi, mid, lo}. Identity:
    kappa = (n·agree − Σ_k a_k·b_k) / (n² − Σ_k a_k·b_k) — clearing
    p_o/p_e denominators so the interior stays exact BIGINT (marginal
    products fit int64 through sf1000; the sums route through
    decimal(38,0) anyway) and the only division is the final rounded
    double. Scale: one map-side-combinable groupBy to ≤9 contingency
    cells; everything after is constant-size."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi"
        ).when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("lo").alias("ra"),
        F.when(F.col("o_totalprice") >= 200000, "hi")
        .when(F.col("o_totalprice") >= 75000, "mid")
        .otherwise("lo").alias("rb"),
    )
    cells = o.groupBy("ra", "rb").agg(F.count("*").alias("c"))
    a = cells.groupBy("ra").agg(F.sum("c").alias("ak"))
    b = cells.groupBy("rb").agg(F.sum("c").alias("bk"))
    pe_num = (
        a.join(b, F.col("ra") == F.col("rb"))
        .agg(
            F.sum(F.col("ak").cast("decimal(38,0)") * F.col("bk"))
            .alias("pe")
        )
    )
    po = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("agree"),
    )
    return (
        po.crossJoin(F.broadcast(pe_num))
        .select(
            "n",
            "agree",
            F.col("pe").cast("string").alias("chance_agree_num"),
            F.round(
                (
                    F.col("n").cast("decimal(38,0)") * F.col("agree")
                    - F.col("pe")
                ).cast("double")
                / (
                    F.col("n").cast("decimal(38,0)") * F.col("n")
                    - F.col("pe")
                ).cast("double"),
                6,
            ).alias("kappa"),
        )
    )


ORACLE_COHENS_KAPPA = """
WITH o AS MATERIALIZED (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hi'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
              ELSE 'lo' END AS ra,
         CASE WHEN o_totalprice >= 200000 THEN 'hi'
              WHEN o_totalprice >= 75000 THEN 'mid'
              ELSE 'lo' END AS rb
  FROM orders
),
cells AS MATERIALIZED (
  SELECT ra, rb, COUNT(*) AS c FROM o GROUP BY 1, 2
),
marg AS MATERIALIZED (
  SELECT a.ra AS k,
         CAST(a.ak AS DECIMAL(38,0)) * b.bk AS akbk
  FROM (SELECT ra, SUM(c) AS ak FROM cells GROUP BY 1) a
  JOIN (SELECT rb, SUM(c) AS bk FROM cells GROUP BY 1) b
    ON a.ra = b.rb
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
  FROM cells
)
SELECT n, agree,
       CAST((SELECT SUM(akbk) FROM marg) AS VARCHAR) AS chance_agree_num,
       ROUND(CAST(CAST(n AS DECIMAL(38,0)) * agree
                  - (SELECT SUM(akbk) FROM marg) AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * n
                  - (SELECT SUM(akbk) FROM marg) AS DOUBLE), 6) AS kappa
FROM tot
"""


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between two categoricals (lineitem
    return flag × line status) — the effect-size companion to a chi²
    test: V = sqrt(chi²/(n·min(r−1, c−1))), scale-free in [0,1].
    Exactness: chi² + n = n·Σ_ij o_ij²/(r_i·c_j); each cell term
    floors at micro-scale inside decimal(38,0) —
    floor(10^6·n·o_ij² / (r_i·c_j)) via the exact (p − p%q)/q decimal
    division — so chi2_micro = Σ terms − 10^6·n is an IDENTICAL
    integer on both engines (a ±21-cell floor error at 1e-6 scale,
    far below the rounded output), and V is one double sqrt of a
    ratio of identical integers. Scale: one map-side-combinable
    groupBy to r×c ≤ 21 cells + two marginal reductions of that
    bounded frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("sm")
    )
    cells = li.groupBy("rf", "sm").agg(F.count("*").alias("o"))
    rows = cells.groupBy("rf").agg(F.sum("o").alias("ri"))
    colsm = cells.groupBy("sm").agg(F.sum("o").alias("cj"))
    j = cells.join(rows, "rf").join(colsm, "sm")
    # per-cell exact floor needs n — bring the total back to the cells
    tot = j.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "(CAST(1000000 AS DECIMAL(38,0)) * n * o * o"
                    " - (CAST(1000000 AS DECIMAL(38,0)) * n * o * o)"
                    "   % (CAST(ri AS DECIMAL(38,0)) * cj))"
                    " / (CAST(ri AS DECIMAL(38,0)) * cj)"
                ).cast("decimal(38,0)")
            ).alias("term_sum"),
            F.max("n").cast("long").alias("n"),
            F.countDistinct("rf").cast("long").alias("r"),
            F.countDistinct("sm").cast("long").alias("c"),
        )
    )
    chi2_micro = F.expr(
        "term_sum - CAST(1000000 AS DECIMAL(38,0)) * n"
    ).cast("decimal(38,0)")
    dfm = F.least(F.col("r") - 1, F.col("c") - 1)
    return terms.select(
        "n",
        "r",
        "c",
        chi2_micro.cast("string").alias("chi2_micro"),
        F.round(
            F.sqrt(
                chi2_micro.cast("double")
                / (
                    F.lit(1000000.0)
                    * F.col("n").cast("double")
                    * dfm.cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


ORACLE_CRAMERS_V = """
WITH cells AS MATERIALIZED (
  SELECT l_returnflag AS rf, l_linestatus AS sm, COUNT(*) AS o
  FROM lineitem GROUP BY 1, 2
),
j AS MATERIALIZED (
  SELECT cells.rf, cells.sm, cells.o, r.ri, c.cj
  FROM cells
  JOIN (SELECT rf, SUM(o) AS ri FROM cells GROUP BY 1) r ON cells.rf = r.rf
  JOIN (SELECT sm, SUM(o) AS cj FROM cells GROUP BY 1) c ON cells.sm = c.sm
),
tot AS MATERIALIZED (SELECT CAST(SUM(o) AS BIGINT) AS n FROM j),
agg AS MATERIALIZED (
  SELECT SUM(
           (CAST(1000000 AS DECIMAL(38,0)) * tot.n * o * o
            - (CAST(1000000 AS DECIMAL(38,0)) * tot.n * o * o)
              % (CAST(ri AS DECIMAL(38,0)) * cj))
           / (CAST(ri AS DECIMAL(38,0)) * cj)
         ) AS term_sum,
         MAX(tot.n) AS n,
         CAST(COUNT(DISTINCT rf) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT sm) AS BIGINT) AS c
  FROM j CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n, r, c,
       CAST(CAST(term_sum - CAST(1000000 AS DECIMAL(38,0)) * n
                 AS DECIMAL(38,0)) AS VARCHAR) AS chi2_micro,
       ROUND(sqrt(CAST(term_sum - CAST(1000000 AS DECIMAL(38,0)) * n
                       AS DOUBLE)
                  / (1000000.0 * CAST(n AS DOUBLE)
                     * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6)
         AS cramers_v
FROM agg
"""




EXTRA_QUERIES.update(
    {
        "cohens_kappa": (
            q_cohens_kappa,
            ORACLE_COHENS_KAPPA,
            "ext:Cohen's kappa inter-rater agreement (cleared denominators)",
        ),
        "cramers_v": (
            q_cramers_v,
            ORACLE_CRAMERS_V,
            "ext:Cramér's V categorical association (micro-exact chi²)",
        ),
    }
)


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between part retail price and part
    size — the monotone-association twin of regr_aggs' Pearson:
    Pearson over AVERAGE ranks (the tie-correct definition sklearn/
    scipy implement). Ranks never materialize per row through a global
    row_number: each column ranks via the distinct-value trick —
    groupBy value (map-side combinable), one cumulative window over
    the DISTINCT-value frame, then 2·avgrank = 2·cum_before + cnt + 1
    (doubling keeps tied average ranks integral) joined back by value.
    Moment sums run in decimal(38,0), so the correlation numerator
    n·Σxy − Σx·Σy and both variance terms are IDENTICAL exact integers
    on both engines (emitted as strings; they pass int64 at large SF);
    rho is one rounded double of their ratio."""
    p = _t(spark, sf_dir, "part").select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("x"),
        F.col("p_size").cast("long").alias("y"),
    )

    def ranks2(col: str) -> DataFrame:
        per = p.groupBy(col).agg(F.count("*").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return per.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + 1
            ).cast("long").alias(f"{col}r2"),
        )

    rows = p.join(ranks2("x"), "x").join(ranks2("y"), "y")
    t = rows.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("xr2").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yr2").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("xr2").cast("decimal(38,0)") * F.col("yr2")).alias("sxy"),
        F.sum(F.col("xr2").cast("decimal(38,0)") * F.col("xr2")).alias("sxx"),
        F.sum(F.col("yr2").cast("decimal(38,0)") * F.col("yr2")).alias("syy"),
    )
    num = F.expr("CAST(n AS DECIMAL(38,0)) * sxy - sx * sy")
    vx = F.expr("CAST(n AS DECIMAL(38,0)) * sxx - sx * sx")
    vy = F.expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy")
    return t.select(
        "n",
        num.cast("string").alias("cov_num"),
        vx.cast("string").alias("var_x_num"),
        vy.cast("string").alias("var_y_num"),
        F.round(
            num.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            6,
        ).alias("spearman_rho"),
    )


ORACLE_SPEARMAN_CORR = """
WITH p AS MATERIALIZED (
  SELECT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS x,
         CAST(p_size AS BIGINT) AS y
  FROM part
),
rx AS MATERIALIZED (
  SELECT x,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS xr2
  FROM (SELECT x, COUNT(*) AS cnt FROM p GROUP BY 1)
),
ry AS MATERIALIZED (
  SELECT y,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS yr2
  FROM (SELECT y, COUNT(*) AS cnt FROM p GROUP BY 1)
),
rows_r AS MATERIALIZED (
  SELECT xr2, yr2 FROM p JOIN rx USING (x) JOIN ry USING (y)
),
t AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(xr2 AS DECIMAL(38,0))) AS sx,
         SUM(CAST(yr2 AS DECIMAL(38,0))) AS sy,
         SUM(CAST(xr2 AS DECIMAL(38,0)) * yr2) AS sxy,
         SUM(CAST(xr2 AS DECIMAL(38,0)) * xr2) AS sxx,
         SUM(CAST(yr2 AS DECIMAL(38,0)) * yr2) AS syy
  FROM rows_r
)
SELECT n,
       CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS VARCHAR) AS cov_num,
       CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS VARCHAR)
         AS var_x_num,
       CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS VARCHAR)
         AS var_y_num,
       ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
                    * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                           AS DOUBLE)), 6) AS spearman_rho
FROM t
"""


def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    audit a training-data pipeline runs on source/domain contribution
    (is 1% of customers 90% of the corpus?). Identity: with x sorted
    ascending and 1-based positions, G = (2·Σ i·x_i − (n+1)·Σx) /
    (n·Σx), computed with the position sum pre-doubled so m(m+1)/2
    never divides. The position sum never needs a per-row global row_number:
    tied values share a value block, so groupBy value (map-side
    combinable) + one cumulative window over the DISTINCT-value frame
    gives Σ_{i in block} i = m·cum_before + m(m+1)/2, and the block
    contributes x·that — position assignment within a tie block is
    irrelevant since x is constant there. Numerator/denominator are
    exact decimal(38,0) (emitted as strings); G is one rounded double
    division."""
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    per = rev.groupBy("x").agg(F.count("*").alias("m"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    blocks = per.select(
        "x",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("cum"),
    )
    t = blocks.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("m")).alias("s"),
        # pos2_sum = 2·Σ i·x_i (doubled to keep m(m+1)/2 integral
        # without any interior division on either engine)
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * (
                2 * F.col("m").cast("decimal(38,0)") * F.col("cum")
                + F.col("m").cast("decimal(38,0)") * (F.col("m") + 1)
            )
        ).alias("pos2_sum"),
    )
    num = F.expr("pos2_sum - (CAST(n AS DECIMAL(38,0)) + 1) * s")
    den = F.expr("CAST(n AS DECIMAL(38,0)) * s")
    return t.select(
        "n",
        num.cast("string").alias("gini_num"),
        den.cast("string").alias("gini_den"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    )


ORACLE_GINI_CONCENTRATION = """
WITH rev AS MATERIALIZED (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
blocks AS MATERIALIZED (
  SELECT x, m,
         CAST(COALESCE(SUM(m) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum
  FROM (SELECT x, COUNT(*) AS m FROM rev GROUP BY 1)
),
t AS MATERIALIZED (
  SELECT CAST(SUM(m) AS BIGINT) AS n,
         SUM(CAST(x AS DECIMAL(38,0)) * m) AS s,
         SUM(CAST(x AS DECIMAL(38,0))
             * (2 * CAST(m AS DECIMAL(38,0)) * cum
                + CAST(m AS DECIMAL(38,0)) * (m + 1))) AS pos2_sum
  FROM blocks
)
SELECT n,
       CAST(pos2_sum - (CAST(n AS DECIMAL(38,0)) + 1) * s AS VARCHAR)
         AS gini_num,
       CAST(CAST(n AS DECIMAL(38,0)) * s AS VARCHAR) AS gini_den,
       ROUND(CAST(pos2_sum - (CAST(n AS DECIMAL(38,0)) + 1) * s
                  AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * s AS DOUBLE), 6) AS gini
FROM t
"""


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test over the 1995 daily-revenue series —
    the nonparametric is-there-a-monotone-trend gate (Theil–Sen's
    hypothesis-test companion; theil_sen_slope estimates the slope,
    this scores its significance): S = Σ_{i<j} sign(y_j − y_i), with
    the tie-corrected variance var = (n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5))/18 and z = (S − sign(S))/sqrt(var). S and
    18·var are exact BIGINTs (identical both engines); z is one
    rounded double. Scale: the pair sweep is a self-join on the
    calendar-bounded ≤365-row day frame (≤66k pairs, constant
    whatever the table SF — the day table is the aggregate); the
    sf-sized work is one map-side-combinable groupBy to days."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    a, b = days.alias("a"), days.alias("b")
    s_stat = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(F.signum(F.col("b.y") - F.col("a.y")).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    ties = days.groupBy("y").agg(F.count("*").alias("t"))
    vart = ties.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(
            F.col("t").cast("decimal(38,0)")
            * (F.col("t") - 1)
            * (2 * F.col("t") + 5)
        ).alias("tie_term"),
    )
    j = s_stat.crossJoin(F.broadcast(vart))
    var18 = F.expr(
        "CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - tie_term"
    )
    return j.select(
        "n",
        "s",
        var18.cast("string").alias("var18"),
        F.round(
            (
                F.col("s").cast("double")
                - F.signum(F.col("s").cast("double"))
            )
            / F.sqrt(var18.cast("double") / F.lit(18.0)),
            6,
        ).alias("z_stat"),
    )


ORACLE_MANN_KENDALL_TREND = """
WITH days AS MATERIALIZED (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
s_stat AS MATERIALIZED (
  SELECT CAST(SUM(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s
  FROM days a JOIN days b ON a.d < b.d
),
vart AS MATERIALIZED (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT y, COUNT(*) AS t FROM days GROUP BY 1)
)
SELECT n, s,
       CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5) - tie_term
            AS VARCHAR) AS var18,
       ROUND((CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
             / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5)
                         - tie_term AS DOUBLE) / 18.0), 6) AS z_stat
FROM s_stat CROSS JOIN vart
"""


EXTRA_QUERIES.update(
    {
        "spearman_corr": (
            q_spearman_corr,
            ORACLE_SPEARMAN_CORR,
            "ext:Spearman rank correlation (tie-correct, distinct-value"
            " ranks)",
        ),
        "gini_concentration": (
            q_gini_concentration,
            ORACLE_GINI_CONCENTRATION,
            "ext:Gini concentration of per-customer revenue (block ranks)",
        ),
        "mann_kendall_trend": (
            q_mann_kendall_trend,
            ORACLE_MANN_KENDALL_TREND,
            "ext:Mann–Kendall trend test (exact S + tie-corrected var)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round 9: robust-statistics + gaps-and-islands pack — exact order
# statistics from the distinct-value cumulative trick (no per-row
# global row_number anywhere), per-user streaks via island grouping.
# --------------------------------------------------------------------------


def q_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-trimmed and 5%-winsorized means of order total price —
    the outlier-robust location estimators a quality pipeline prefers
    over the raw mean (one corrupt crawl document shouldn't move the
    corpus statistic). Order statistics never materialize a global
    per-row row_number: groupBy distinct price (map-side combinable),
    one cumulative window over the distinct-value frame, then each
    value block [cum+1, cum+m] contributes v·overlap with the kept
    rank interval [lo+1, n−lo] (lo = floor(5·n/100)) — the trimmed sum
    — while the winsorized sum adds the clamped tails lo·v_lo + lo·v_hi
    (v_lo/v_hi = the order statistics at ranks lo+1 and n−lo, found by
    the same cum arithmetic). All sums exact BIGINT cents inside
    decimal(38,0) (emitted as strings); the two means are single
    rounded double divisions. Scale: one keyed agg + one
    distinct-value window — the auc/ECDF pattern."""
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    per = o.groupBy("v").agg(F.count("*").alias("m"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    blocks = per.select(
        "v",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("cum"),
    ).localCheckpoint(eager=True)
    tot = blocks.agg(F.sum("m").cast("long").alias("n"))
    b = blocks.crossJoin(F.broadcast(tot))
    lo = F.expr("n * 5 div 100").cast("long")
    keep_lo = lo + 1
    keep_hi = F.col("n") - lo
    # overlap of [cum+1, cum+m] with [keep_lo, keep_hi]
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum") + F.col("m"), keep_hi)
        - F.greatest(F.col("cum") + 1, keep_lo)
        + 1,
    )
    # order statistics at the clamp ranks
    v_lo = F.when(
        (F.col("cum") < keep_lo) & (F.col("cum") + F.col("m") >= keep_lo),
        F.col("v"),
    )
    v_hi = F.when(
        (F.col("cum") < keep_hi) & (F.col("cum") + F.col("m") >= keep_hi),
        F.col("v"),
    )
    t = b.agg(
        F.max("n").alias("n"),
        F.max(lo).alias("lo"),
        F.sum(F.col("v").cast("decimal(38,0)") * ov).alias("trim_sum"),
        F.max(v_lo).alias("v_lo"),
        F.max(v_hi).alias("v_hi"),
    )
    wins_sum = F.expr(
        "trim_sum + CAST(lo AS DECIMAL(38,0)) * v_lo"
        " + CAST(lo AS DECIMAL(38,0)) * v_hi"
    )
    return t.select(
        F.col("n").cast("long").alias("n"),
        F.col("lo").cast("long").alias("n_trimmed_each_side"),
        F.col("v_lo").cast("long").alias("clamp_lo_cents"),
        F.col("v_hi").cast("long").alias("clamp_hi_cents"),
        F.col("trim_sum").cast("string").alias("trimmed_sum_cents"),
        wins_sum.cast("string").alias("winsorized_sum_cents"),
        F.round(
            F.col("trim_sum").cast("double")
            / (F.col("n") - 2 * F.col("lo")).cast("double"),
            4,
        ).alias("trimmed_mean_cents"),
        F.round(wins_sum.cast("double") / F.col("n").cast("double"), 4)
        .alias("winsorized_mean_cents"),
    )


ORACLE_TRIMMED_WINSORIZED_MEAN = """
WITH o AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
blocks AS MATERIALIZED (
  SELECT v, m,
         CAST(COALESCE(SUM(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum
  FROM (SELECT v, COUNT(*) AS m FROM o GROUP BY 1)
),
tot AS MATERIALIZED (SELECT CAST(SUM(m) AS BIGINT) AS n FROM blocks),
b AS MATERIALIZED (
  SELECT v, m, cum, n, n * 5 // 100 AS lo FROM blocks CROSS JOIN tot
),
t AS MATERIALIZED (
  SELECT MAX(n) AS n, MAX(lo) AS lo,
         SUM(CAST(v AS DECIMAL(38,0))
             * GREATEST(0, LEAST(cum + m, n - lo)
                           - GREATEST(cum + 1, lo + 1) + 1)) AS trim_sum,
         MAX(CASE WHEN cum < lo + 1 AND cum + m >= lo + 1 THEN v END)
           AS v_lo,
         MAX(CASE WHEN cum < n - lo AND cum + m >= n - lo THEN v END)
           AS v_hi
  FROM b
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(lo AS BIGINT) AS n_trimmed_each_side,
       CAST(v_lo AS BIGINT) AS clamp_lo_cents,
       CAST(v_hi AS BIGINT) AS clamp_hi_cents,
       CAST(trim_sum AS VARCHAR) AS trimmed_sum_cents,
       CAST(trim_sum + CAST(lo AS DECIMAL(38,0)) * v_lo
            + CAST(lo AS DECIMAL(38,0)) * v_hi AS VARCHAR)
         AS winsorized_sum_cents,
       ROUND(CAST(trim_sum AS DOUBLE) / CAST(n - 2 * lo AS DOUBLE), 4)
         AS trimmed_mean_cents,
       ROUND(CAST(trim_sum + CAST(lo AS DECIMAL(38,0)) * v_lo
                  + CAST(lo AS DECIMAL(38,0)) * v_hi AS DOUBLE)
             / CAST(n AS DOUBLE), 4) AS winsorized_mean_cents
FROM t
"""


def q_weighted_median_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median unit price per return flag — the
    grouped robust aggregation (percentile_approx's exact cousin;
    sketches estimate, this answers): the weighted median is the
    smallest price v where cumulative weight reaches half the group
    total, i.e. 2·cumw ≥ W with the LOWER median convention. Per
    group: groupBy (flag, price) with weight sums (map-side
    combinable), a cumulative window PARTITIONED BY the group (never a
    single global partition — each group's distinct-price frame sorts
    independently), then min(v | 2·cumw ≥ W). Everything is exact
    BIGINT (cents × integer quantity); no division at all. Scale:
    shuffle keyed on the group — the standard grouped-window shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    per = li.groupBy("g", "v").agg(F.sum("wt").alias("mw"))
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "g", "v", F.sum("mw").over(w).cast("long").alias("cumw")
    )
    totals = per.groupBy("g").agg(F.sum("mw").cast("long").alias("tw"))
    j = cum.join(totals, "g")
    med = (
        j.filter(2 * F.col("cumw") >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("v").cast("long").alias("wmedian_cents"))
    )
    return (
        med.join(totals, "g")
        .select(
            "g",
            F.col("tw").alias("total_weight"),
            "wmedian_cents",
        )
        .orderBy("g")
    )


ORACLE_WEIGHTED_MEDIAN_GROUPED = """
WITH li AS MATERIALIZED (
  SELECT l_returnflag AS g,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS wt
  FROM lineitem
),
per AS MATERIALIZED (
  SELECT g, v, SUM(wt) AS mw FROM li GROUP BY 1, 2
),
cum AS MATERIALIZED (
  SELECT g, v,
         CAST(SUM(mw) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cumw
  FROM per
),
totals AS MATERIALIZED (
  SELECT g, CAST(SUM(mw) AS BIGINT) AS tw FROM per GROUP BY 1
)
SELECT cum.g AS g,
       MAX(tw) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cumw >= tw THEN v END) AS BIGINT)
         AS wmedian_cents
FROM cum JOIN totals ON cum.g = totals.g
GROUP BY 1 ORDER BY 1
"""


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps &
    islands) — the classic retention/engagement feature: distinct
    (user, day), then island id = day − rank-within-user (consecutive
    days share it; Spark row_number is PARTITIONED by user — the
    scalable per-key window, never global), streak length = island
    size, then the per-user max. Output is the streak-length
    distribution + topline (how many users ever hit a 3-day streak),
    aggregation-stable across engines because day arithmetic is
    integer (epoch days) and ranks are within-key. Scale: two keyed
    shuffles (user, then user×island reduce) — linear, skew-safe
    (a user's days are bounded by the calendar)."""
    days = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("u"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    wn = Window.partitionBy("u").orderBy("day")
    islands = days.select(
        "u",
        "day",
        (F.col("day") - F.row_number().over(wn)).alias("isl"),
    )
    streaks = islands.groupBy("u", "isl").agg(
        F.count("*").cast("long").alias("len")
    )
    best = streaks.groupBy("u").agg(F.max("len").alias("best"))
    return (
        best.groupBy("best")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("u").cast("long").alias("user_id_sum"),
        )
        .orderBy("best")
    )


ORACLE_USER_STREAKS = """
WITH days AS MATERIALIZED (
  SELECT DISTINCT user_id AS u,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day
  FROM events
),
islands AS MATERIALIZED (
  SELECT u, day,
         day - ROW_NUMBER() OVER (PARTITION BY u ORDER BY day) AS isl
  FROM days
),
streaks AS MATERIALIZED (
  SELECT u, isl, CAST(COUNT(*) AS BIGINT) AS len
  FROM islands GROUP BY 1, 2
),
best AS MATERIALIZED (
  SELECT u, MAX(len) AS best FROM streaks GROUP BY 1
)
SELECT best, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(u) AS BIGINT) AS user_id_sum
FROM best GROUP BY 1 ORDER BY 1
"""


EXTRA_QUERIES.update(
    {
        "trimmed_winsorized_mean": (
            q_trimmed_winsorized_mean,
            ORACLE_TRIMMED_WINSORIZED_MEAN,
            "ext:exact trimmed + winsorized means (block order statistics)",
        ),
        "weighted_median_grouped": (
            q_weighted_median_grouped,
            ORACLE_WEIGHTED_MEDIAN_GROUPED,
            "ext:exact grouped weighted median (keyed cumulative weights)",
        ),
        "user_streaks": (
            q_user_streaks,
            ORACLE_USER_STREAKS,
            "ext:gaps-and-islands longest-streak distribution",
        ),
    }
)


# --------------------------------------------------------------------------
# Round 9 (continued): IR phrase search, checked approximate quantiles,
# watermark-scoped streaming dedup, seasonal decomposition.
# --------------------------------------------------------------------------


def q_approx_quantile_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with a HARD error check (the
    hll_mergeable_checked pattern — a sketch is only usable at 100 TB
    if its error bound is VERIFIED, not trusted): Spark's
    approx_percentile(totalprice, q, accuracy) guarantees a rank error
    ≤ n/accuracy (Greenwald-Khanna/KLL contract). The check computes
    the approximate value's TRUE rank interval [rank_lo, rank_hi)
    exactly (two count-aggregates against the base data) and asserts
    |true_rank − q·n| ≤ n/accuracy + tie-width, emitted as booleans
    the oracle pins to TRUE literals alongside the exact-quantile
    twin values. The estimate itself is engine-specific → the boolean
    + exact-twin columns are the oracle surface, never the estimate."""
    acc = 1000
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).localCheckpoint(eager=True)
    qs = [0.25, 0.5, 0.9]
    approx = o.agg(
        *[
            F.expr(f"approx_percentile(v, {q}, {acc})").alias(f"a{i}")
            for i, q in enumerate(qs)
        ],
        F.count("*").alias("n"),
    )
    # exact twin: lower-quantile order statistic at rank ceil(q*n) via
    # the distinct-value cum trick (the weighted-median machinery)
    per = o.groupBy("v").agg(F.count("*").alias("m"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select("v", F.sum("m").over(w).cast("long").alias("cum"))
    j = cum.crossJoin(F.broadcast(approx))
    aggs = [F.max("n").cast("long").alias("n")]
    for i, q in enumerate(qs):
        # exact value at rank ceil(q*n): smallest v with cum >= ceil(q*n)
        target = F.expr(f"CAST(ceil({q} * n) AS BIGINT)")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("v")))
            .cast("long").alias(f"exact_q{i}")
        )
        # true rank interval of the approx value a_i
        aggs.append(
            F.max(F.when(F.col("v") <= F.col(f"a{i}"), F.col("cum")))
            .alias(f"rank_hi{i}")
        )
        aggs.append(
            F.max(F.when(F.col("v") < F.col(f"a{i}"), F.col("cum")))
            .alias(f"rank_lo{i}")
        )
    raw = j.agg(*aggs)
    out_cols = [F.col("n")]
    for i, q in enumerate(qs):
        target = F.expr(f"CAST(ceil({q} * n) AS BIGINT)")
        slack = F.expr(f"n div {acc}")
        ok = (
            (F.coalesce(F.col(f"rank_hi{i}"), F.lit(0))
             >= target - slack - 1)
            & (F.coalesce(F.col(f"rank_lo{i}"), F.lit(0))
               <= target + slack)
        )
        out_cols.append(F.col(f"exact_q{i}"))
        out_cols.append(ok.alias(f"bound_ok_q{i}"))
    return raw.select(*out_cols)


ORACLE_APPROX_QUANTILE_CHECKED = """
WITH o AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
cum AS MATERIALIZED (
  SELECT v, CAST(SUM(m) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM (SELECT v, COUNT(*) AS m FROM o GROUP BY 1)
),
tot AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o)
SELECT n,
       (SELECT MIN(v) FROM cum
        WHERE cum >= CAST(ceil(0.25 * tot.n) AS BIGINT)) AS exact_q0,
       TRUE AS bound_ok_q0,
       (SELECT MIN(v) FROM cum
        WHERE cum >= CAST(ceil(0.5 * tot.n) AS BIGINT)) AS exact_q1,
       TRUE AS bound_ok_q1,
       (SELECT MIN(v) FROM cum
        WHERE cum >= CAST(ceil(0.9 * tot.n) AS BIGINT)) AS exact_q2,
       TRUE AS bound_ok_q2
FROM tot
"""


EXTRA_QUERIES.update(
    {
        "approx_quantile_checked": (
            q_approx_quantile_checked,
            ORACLE_APPROX_QUANTILE_CHECKED,
            "ext:approx_percentile with verified rank-error bound"
            " + exact twin",
        ),
    }
)


# --------------------------------------------------------------------------
# Round-9 late additions: nonparametric / classical statistics pack II
# --------------------------------------------------------------------------


def q_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does l_quantity differ across the three
    return-flag populations? The k-group generalization of
    mann_whitney_u, same counting form: ONE keyed count reduces the
    data to the ≤50-row quantity histogram, average ranks come from a
    cumulative window over that bounded table (2·rank(v) = 2·cum_below
    + count(v) + 1, kept integer as r2), per-group rank sums stay exact
    BIGINT (Σ c_g·r2 = 2·R_g), and H is derived in double from the
    exact integer moments with the tie correction 1 − Σ(t³−t)/(N³−N)
    (tie cubes through decimal(38,0) — the mann_whitney_u overflow
    rationale). Scale: one map-side-combinable aggregate on a bounded
    key domain; windows over ≤50 rows only."""
    li = _t(spark, sf_dir, "lineitem")
    # FLOOR, not cast (the q_sssp_weighted truncate-vs-round convention)
    cells = li.groupBy(F.floor("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cn"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cr"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c_tot = F.col("ca") + F.col("cn") + F.col("cr")
    stepped = cells.select(
        "ca",
        "cn",
        "cr",
        (
            2 * F.coalesce(F.sum(c_tot).over(w), F.lit(0)) + c_tot + 1
        ).alias("r2"),
    )
    t_dec = c_tot.cast("decimal(38,0)")
    agg = stepped.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cn").cast("long").alias("n_n"),
        F.sum("cr").cast("long").alias("n_r"),
        F.sum(F.col("ca") * F.col("r2")).cast("long").alias("r2_a"),
        F.sum(F.col("cn") * F.col("r2")).cast("long").alias("r2_n"),
        F.sum(F.col("cr") * F.col("r2")).cast("long").alias("r2_r"),
        F.sum(t_dec * t_dec * t_dec - t_dec).cast("double").alias("tie_cubes"),
    )
    n = (F.col("n_a") + F.col("n_n") + F.col("n_r")).cast("double")
    rsq_over_n = (
        (F.col("r2_a") / 2.0) * (F.col("r2_a") / 2.0) / F.col("n_a")
        + (F.col("r2_n") / 2.0) * (F.col("r2_n") / 2.0) / F.col("n_n")
        + (F.col("r2_r") / 2.0) * (F.col("r2_r") / 2.0) / F.col("n_r")
    )
    h_raw = 12.0 / (n * (n + 1.0)) * rsq_over_n - 3.0 * (n + 1.0)
    h = h_raw / (F.lit(1.0) - F.col("tie_cubes") / (n * n * n - n))
    return agg.select(
        "n_a",
        "n_n",
        "n_r",
        "r2_a",
        "r2_n",
        "r2_r",
        F.round(h * F.lit(1_000_000.0)).cast("long").alias("h_micro"),
    )


ORACLE_KRUSKAL_WALLIS_H = """
WITH cells AS MATERIALIZED (
  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cn,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS cr
  FROM lineitem GROUP BY 1
),
stepped AS (
  SELECT ca, cn, cr,
         2 * COALESCE(SUM(ca + cn + cr) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + (ca + cn + cr) + 1 AS r2
  FROM cells
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cn) AS BIGINT) AS n_n,
         CAST(SUM(cr) AS BIGINT) AS n_r,
         CAST(SUM(ca * r2) AS BIGINT) AS r2_a,
         CAST(SUM(cn * r2) AS BIGINT) AS r2_n,
         CAST(SUM(cr * r2) AS BIGINT) AS r2_r,
         CAST(SUM(CAST(ca + cn + cr AS HUGEINT) * (ca + cn + cr)
                  * (ca + cn + cr) - (ca + cn + cr)) AS DOUBLE) AS tie_cubes
  FROM stepped
)
SELECT n_a, n_n, n_r, r2_a, r2_n, r2_r,
       CAST(ROUND(
         (12.0 / (CAST(n_a + n_n + n_r AS DOUBLE)
                  * (CAST(n_a + n_n + n_r AS DOUBLE) + 1.0))
            * ((r2_a / 2.0) * (r2_a / 2.0) / n_a
               + (r2_n / 2.0) * (r2_n / 2.0) / n_n
               + (r2_r / 2.0) * (r2_r / 2.0) / n_r)
          - 3.0 * (CAST(n_a + n_n + n_r AS DOUBLE) + 1.0))
         / (1.0 - tie_cubes
                  / (CAST(n_a + n_n + n_r AS DOUBLE)
                     * CAST(n_a + n_n + n_r AS DOUBLE)
                     * CAST(n_a + n_n + n_r AS DOUBLE)
                     - CAST(n_a + n_n + n_r AS DOUBLE)))
         * 1000000) AS BIGINT) AS h_micro
FROM agg
"""


def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily order volume and
    daily revenue over the 1995 calendar — the third rank-correlation
    surface beside spearman_corr (which needs full ranks) and
    mann_kendall_trend (which tests one series against time). The
    expensive input reduces to the ≤365-row (day, n_orders,
    price_cents) frame in ONE map-side-combinable aggregate; pair
    enumeration is a broadcast `d < d'` self-join of that bounded frame
    (BroadcastNestedLoopJoin over ≤365² = 133k pairs — a model-frame
    cross, the copurchase/containment precedent, never data×data).
    Concordant/discordant/tie pair counts stay exact BIGINT; tau_b =
    (C−D)/√((n0−tx)(n0−ty)) is derived in double from those integers
    and quantized to micro-units."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    a = days.alias("a")
    b = F.broadcast(days.alias("b"))
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    pairs = a.join(b, F.col("a.d") < F.col("b.d"))
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            (((dx > 0) & (dy > 0)) | ((dx < 0) & (dy < 0))).cast("long")
        )
        .cast("long")
        .alias("nc"),
        F.sum(
            (((dx > 0) & (dy < 0)) | ((dx < 0) & (dy > 0))).cast("long")
        )
        .cast("long")
        .alias("nd"),
        F.sum((dx == 0).cast("long")).cast("long").alias("tie_x_pairs"),
        F.sum((dy == 0).cast("long")).cast("long").alias("tie_y_pairs"),
    )
    tau = (F.col("nc") - F.col("nd")) / F.sqrt(
        (F.col("n_pairs") - F.col("tie_x_pairs")).cast("double")
        * (F.col("n_pairs") - F.col("tie_y_pairs"))
    )
    return agg.select(
        "n_pairs",
        "nc",
        "nd",
        "tie_x_pairs",
        "tie_y_pairs",
        F.round(tau * F.lit(1_000_000.0)).cast("long").alias("tau_b_micro"),
    )


ORACLE_KENDALL_TAU_DAILY = """
WITH days AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN (a.x > b.x AND a.y > b.y)
                         OR (a.x < b.x AND a.y < b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN (a.x > b.x AND a.y < b.y)
                         OR (a.x < b.x AND a.y > b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_x_pairs,
         CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
           AS tie_y_pairs
  FROM days a JOIN days b ON a.d < b.d
)
SELECT n_pairs, nc, nd, tie_x_pairs, tie_y_pairs,
       CAST(ROUND((nc - nd)
                  / SQRT(CAST(n_pairs - tie_x_pairs AS DOUBLE)
                         * (n_pairs - tie_y_pairs))
                  * 1000000) AS BIGINT) AS tau_b_micro
FROM agg
"""


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on mean extended price between
    return flags A and N — the parametric complement to mann_whitney_u
    (means under unequal variances vs rank shift). ONE conditional
    aggregate produces the exact integer moments per group (n, Σcents
    as BIGINT, Σcents² through decimal(38,0) — the square of a 1e7-cent
    line item times SF≈6 row counts overflows int64); means are emitted
    as exact integer micro-cents via integer division, and t / the
    Welch–Satterthwaite df are derived in double from the exact moments
    only at the end. Scale: a single map-side-combinable pass, no
    shuffle beyond the 1-row final aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # per-row square stays in LONG (cents² ≤ ~1.4e14 — exact and cheap
    # in whole-stage codegen); only the SUM runs in decimal(38,0),
    # where int64 would overflow around SF≈1 (10× probe: the earlier
    # decimal×decimal per row made this one scan 6× slower)
    sq_dec = (cents * cents).cast("decimal(38,0)")
    is_a = F.col("l_returnflag") == "A"
    agg = li.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, cents).otherwise(0)).cast("long").alias("s_a"),
        F.sum(F.when(~is_a, cents).otherwise(0)).cast("long").alias("s_b"),
        F.sum(F.when(is_a, sq_dec).otherwise(0))
        .cast("double")
        .alias("ss_a"),
        F.sum(F.when(~is_a, sq_dec).otherwise(0))
        .cast("double")
        .alias("ss_b"),
    )
    var_a = (
        F.col("ss_a")
        - F.col("s_a").cast("double") * F.col("s_a") / F.col("n_a")
    ) / (F.col("n_a") - F.lit(1))
    var_b = (
        F.col("ss_b")
        - F.col("s_b").cast("double") * F.col("s_b") / F.col("n_b")
    ) / (F.col("n_b") - F.lit(1))
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    t = (
        F.col("s_a").cast("double") / F.col("n_a")
        - F.col("s_b").cast("double") / F.col("n_b")
    ) / F.sqrt(se2_a + se2_b)
    df = ((se2_a + se2_b) * (se2_a + se2_b)) / (
        se2_a * se2_a / (F.col("n_a") - F.lit(1))
        + se2_b * se2_b / (F.col("n_b") - F.lit(1))
    )
    return agg.select(
        "n_a",
        "n_b",
        # 1e6 × Σcents leaves int64 around SF≈1 — scale up in
        # decimal(38,0); DIV on decimals yields the exact integral part
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * s_a) DIV n_a AS LONG)"
        ).alias("mean_a_microcents"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * s_b) DIV n_b AS LONG)"
        ).alias("mean_b_microcents"),
        F.round(t * F.lit(1_000_000.0)).cast("long").alias("t_micro"),
        F.round(df * F.lit(1_000.0)).cast("long").alias("df_milli"),
    )


ORACLE_WELCH_TTEST = """
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_a,
    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_b,
    CAST(SUM(CASE WHEN l_returnflag = 'A'
                  THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS s_a,
    CAST(SUM(CASE WHEN l_returnflag = 'N'
                  THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS s_b,
    CAST(SUM(CASE WHEN l_returnflag = 'A'
                  THEN CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS HUGEINT)
                  ELSE 0 END) AS DOUBLE) AS ss_a,
    CAST(SUM(CASE WHEN l_returnflag = 'N'
                  THEN CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS HUGEINT)
                  ELSE 0 END) AS DOUBLE) AS ss_b
  FROM lineitem WHERE l_returnflag IN ('A', 'N')
),
derived AS (
  SELECT n_a, n_b, s_a, s_b,
         ((ss_a - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1)) / n_a
           AS se2_a,
         ((ss_b - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1)) / n_b
           AS se2_b
  FROM agg
)
SELECT n_a, n_b,
       CAST((CAST(1000000 AS HUGEINT) * s_a) // n_a AS BIGINT)
         AS mean_a_microcents,
       CAST((CAST(1000000 AS HUGEINT) * s_b) // n_b AS BIGINT)
         AS mean_b_microcents,
       CAST(ROUND((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                  / SQRT(se2_a + se2_b) * 1000000) AS BIGINT) AS t_micro,
       CAST(ROUND(((se2_a + se2_b) * (se2_a + se2_b))
                  / (se2_a * se2_a / (n_a - 1)
                     + se2_b * se2_b / (n_b - 1)) * 1000) AS BIGINT)
         AS df_milli
FROM derived
"""


def q_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation lift & gains table: score = order value band,
    positive = '1-URGENT' priority; rows are ranked by descending score
    band and cut into cumulative-count deciles, and each decile reports
    exact-integer lift and gain in ppm (lift = decile positive rate /
    global positive rate, gain = share of all positives captured so
    far). The ranking never globally sorts rows: ONE keyed aggregate
    reduces the data to ≤130 price-band cells, the decile cut is a
    cumulative window over that bounded frame (decile = ⌈10·cum/N⌉,
    exact via (10·cum + N − 1) DIV N — a whole band lands in one
    decile, the documented bucket-quantized semantics that make the
    cut reproducible at any scale), and lift/gain are integer
    divisions of exact BIGINT counts. Complements auc_score (threshold
    -free) and reliability_bins (calibration) with the
    campaign-targeting view."""
    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.floor(F.col("o_totalprice") / 5000).cast("long").alias("band")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        )
        .cast("long")
        .alias("pos"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cut = cells.select(
        "n",
        "pos",
        F.sum("n").over(wall).alias("n_total"),
        F.sum("pos").over(wall).alias("pos_total"),
        F.sum("n").over(wcum).alias("cum_n"),
    ).select(
        "n",
        "pos",
        "n_total",
        "pos_total",
        F.expr("CAST((10 * cum_n + n_total - 1) DIV n_total AS LONG)").alias(
            "decile"
        ),
    )
    per = cut.groupBy("decile", "n_total", "pos_total").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    wgain = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.select(
            "decile",
            "n_rows",
            "n_pos",
            "pos_total",
            F.sum("n_pos").over(wgain).cast("long").alias("cum_pos"),
            # 1e6·n_pos·n_total leaves int64 around SF≈10 — decimal
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_pos * n_total)"
                " DIV (n_rows * pos_total) AS LONG)"
            ).alias("lift_ppm"),
        )
        .withColumn(
            "cum_gain_ppm",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * cum_pos)"
                " DIV pos_total AS LONG)"
            ),
        )
        .select(
            "decile", "n_rows", "n_pos", "cum_pos", "lift_ppm",
            "cum_gain_ppm",
        )
        .orderBy("decile")
    )


ORACLE_LIFT_GAINS_DECILES = """
WITH cells AS MATERIALIZED (
  SELECT CAST(FLOOR(o_totalprice / 5000) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos
  FROM orders GROUP BY 1
),
cut AS (
  SELECT n, pos,
         SUM(n) OVER () AS n_total,
         SUM(pos) OVER () AS pos_total,
         (10 * SUM(n) OVER (ORDER BY band DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)
          + SUM(n) OVER () - 1) // SUM(n) OVER () AS decile
  FROM cells
),
per AS (
  SELECT decile, n_total, pos_total,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM cut GROUP BY 1, 2, 3
)
SELECT CAST(decile AS BIGINT) AS decile, n_rows, n_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_pos,
       CAST((CAST(1000000 AS HUGEINT) * n_pos * n_total)
            // (n_rows * pos_total) AS BIGINT) AS lift_ppm,
       CAST((CAST(1000000 AS HUGEINT)
             * CAST(SUM(n_pos) OVER (ORDER BY decile
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT))
            // pos_total AS BIGINT) AS cum_gain_ppm
FROM per ORDER BY decile
"""


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent integral
    quantity per return flag, ties broken toward the SMALLEST value
    (neither Spark nor DuckDB pins its native mode() tie-break, so
    both sides spell the same explicit algebra: keyed count → per-group
    rank over (count DESC, value ASC) → first row). Scale: the count
    is one map-side-combinable aggregate to ≤3×50 cells; the ranking
    window runs per-group over ≤50 rows."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.floor("l_quantity").cast("long").alias("v"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("flag").orderBy(F.desc("cnt"), F.asc("v"))
    return (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("flag", F.col("v").alias("mode_qty"), F.col("cnt").alias("n_at_mode"))
        .orderBy("flag")
    )


ORACLE_MODE_PER_GROUP = """
WITH cells AS (
  SELECT l_returnflag AS flag, CAST(FLOOR(l_quantity) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT flag, v, cnt,
         ROW_NUMBER() OVER (PARTITION BY flag
                            ORDER BY cnt DESC, v ASC) AS rn
  FROM cells
)
SELECT flag, v AS mode_qty, cnt AS n_at_mode
FROM ranked WHERE rn = 1 ORDER BY flag
"""


EXTRA_QUERIES.update(
    {
        "kruskal_wallis_h": (
            q_kruskal_wallis_h,
            ORACLE_KRUSKAL_WALLIS_H,
            "ext:Kruskal-Wallis H (k-group rank test, tie-corrected,"
            " exact integer rank sums)",
        ),
        "kendall_tau_daily": (
            q_kendall_tau_daily,
            ORACLE_KENDALL_TAU_DAILY,
            "ext:Kendall tau-b rank correlation (bounded pair join,"
            " exact C/D/tie counts)",
        ),
        "welch_ttest": (
            q_welch_ttest,
            ORACLE_WELCH_TTEST,
            "ext:Welch unequal-variance t-test (exact integer moments,"
            " Welch-Satterthwaite df)",
        ),
        "lift_gains_deciles": (
            q_lift_gains_deciles,
            ORACLE_LIFT_GAINS_DECILES,
            "ext:decile lift & gains table (bucket-quantized deciles,"
            " exact ppm lift/gain)",
        ),
        "mode_per_group": (
            q_mode_per_group,
            ORACLE_MODE_PER_GROUP,
            "ext:deterministic per-group mode (explicit tie-break"
            " algebra both sides)",
        ),
    }
)


def q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily-revenue series at lags
    1–3 (Durbin–Levinson closed forms) — the model-identification
    companion to acf_daily_events: ACF says "how much memory", PACF
    says "how many AR terms". Autocovariances are exact: with S = Σy
    and n days, n²·c_k = Σ (n·y_t − S)(n·y_{t−k} − S) runs in
    decimal(38,0) (per-term products reach ~1e25), so r_k = c_k/c_0
    is a single deterministic decimal→double divide, and φ22/φ33 are
    spelled as the same explicit determinant arithmetic on both
    engines. Scale: ONE keyed aggregate reduces to the ≤365-row daily
    frame; lags ride a window over that bounded frame only."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    totals = days.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    w = Window.orderBy("d")
    lagged = days.crossJoin(F.broadcast(totals)).select(
        (F.col("n") * F.col("y") - F.col("s")).alias("dev"),
        (F.col("n") * F.lag("y", 1).over(w) - F.col("s")).alias("dev1"),
        (F.col("n") * F.lag("y", 2).over(w) - F.col("s")).alias("dev2"),
        (F.col("n") * F.lag("y", 3).over(w) - F.col("s")).alias("dev3"),
        "n",
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cov = lagged.groupBy("n").agg(
        F.sum(dec("dev") * dec("dev")).alias("c0"),
        F.sum(dec("dev") * dec("dev1")).alias("c1"),
        F.sum(dec("dev") * dec("dev2")).alias("c2"),
        F.sum(dec("dev") * dec("dev3")).alias("c3"),
    )
    r1 = F.col("c1").cast("double") / F.col("c0").cast("double")
    r2 = F.col("c2").cast("double") / F.col("c0").cast("double")
    r3 = F.col("c3").cast("double") / F.col("c0").cast("double")
    phi22 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    det3 = (
        (F.lit(1.0) - r1 * r1)
        - r1 * (r1 - r1 * r2)
        + r2 * (r1 * r1 - r2)
    )
    det3n = (
        (r3 - r2 * r1)
        - r1 * (r1 * r3 - r2 * r2)
        + r1 * (r1 * r1 - r2)
    )
    m = F.lit(1_000_000.0)
    return cov.select(
        F.col("n").alias("n_days"),
        F.round(r1 * m).cast("long").alias("r1_micro"),
        F.round(r2 * m).cast("long").alias("r2_micro"),
        F.round(r3 * m).cast("long").alias("r3_micro"),
        F.round(r1 * m).cast("long").alias("pacf1_micro"),
        F.round(phi22 * m).cast("long").alias("pacf2_micro"),
        F.round(det3n / det3 * m).cast("long").alias("pacf3_micro"),
    )


ORACLE_PACF_DAILY = """
WITH days AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
  FROM days
),
lagged AS (
  SELECT n * y - s AS dev,
         n * LAG(y, 1) OVER (ORDER BY d) - s AS dev1,
         n * LAG(y, 2) OVER (ORDER BY d) - s AS dev2,
         n * LAG(y, 3) OVER (ORDER BY d) - s AS dev3,
         n
  FROM days, totals
),
cov AS (
  SELECT n,
         SUM(CAST(dev AS HUGEINT) * dev) AS c0,
         SUM(CAST(dev AS HUGEINT) * dev1) AS c1,
         SUM(CAST(dev AS HUGEINT) * dev2) AS c2,
         SUM(CAST(dev AS HUGEINT) * dev3) AS c3
  FROM lagged GROUP BY n
),
r AS (
  SELECT n,
         CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
         CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
         CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3
  FROM cov
)
SELECT n AS n_days,
       CAST(ROUND(r1 * 1000000) AS BIGINT) AS r1_micro,
       CAST(ROUND(r2 * 1000000) AS BIGINT) AS r2_micro,
       CAST(ROUND(r3 * 1000000) AS BIGINT) AS r3_micro,
       CAST(ROUND(r1 * 1000000) AS BIGINT) AS pacf1_micro,
       CAST(ROUND((r2 - r1 * r1) / (1.0 - r1 * r1) * 1000000) AS BIGINT)
         AS pacf2_micro,
       CAST(ROUND(((r3 - r2 * r1)
                   - r1 * (r1 * r3 - r2 * r2)
                   + r1 * (r1 * r1 - r2))
                  / ((1.0 - r1 * r1)
                     - r1 * (r1 - r1 * r2)
                     + r2 * (r1 * r1 - r2))
                  * 1000000) AS BIGINT) AS pacf3_micro
FROM r
"""


EXTRA_QUERIES.update(
    {
        "pacf_daily": (
            q_pacf_daily,
            ORACLE_PACF_DAILY,
            "ext:partial autocorrelation lags 1-3 (Durbin-Levinson"
            " closed forms, exact integer autocovariances)",
        ),
    }
)


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on order totals — the moment-based
    distribution audit beside ks_two_sample (two-sample) and
    benford_audit (digit law): skewness and excess kurtosis from raw
    power sums, JB = n/6·(S² + (K−3)²/4). Power sums S1..S4 of the
    integer dollar totals are exact decimal(38,0) (d⁴ ≈ 1e23 per row;
    the sums stay inside decimal to ~1e15 rows); the central-moment
    algebra runs in double from those exact sums with the identical
    expression on both engines. Scale: ONE map-side-combinable
    aggregate, no shuffle beyond the 1-row reduce."""
    o = _t(spark, sf_dir, "orders")
    d = F.round("o_totalprice").cast("long")
    dd = d.cast("decimal(38,0)")
    agg = o.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dd).alias("s1"),
        F.sum(dd * dd).alias("s2"),
        F.sum(dd * dd * dd).alias("s3"),
        F.sum(dd * dd * dd * dd).alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mean * mean
    m3 = (
        F.col("s3").cast("double") / n
        - F.lit(3.0) * mean * (F.col("s2").cast("double") / n)
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4").cast("double") / n
        - F.lit(4.0) * mean * (F.col("s3").cast("double") / n)
        + F.lit(6.0) * mean * mean * (F.col("s2").cast("double") / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    skew = m3 / F.sqrt(m2 * m2 * m2)
    kurt = m4 / (m2 * m2)
    jb = n / F.lit(6.0) * (
        skew * skew
        + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
    )
    m = F.lit(1_000_000.0)
    return agg.select(
        "n",
        F.round(skew * m).cast("long").alias("skew_micro"),
        F.round(kurt * m).cast("long").alias("kurtosis_micro"),
        F.round(jb * F.lit(1_000.0)).cast("long").alias("jb_milli"),
    )


ORACLE_JARQUE_BERA = """
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(CAST(ROUND(o_totalprice) AS BIGINT) AS HUGEINT)) AS s1,
         SUM(CAST(CAST(ROUND(o_totalprice) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)) AS s2,
         SUM(CAST(CAST(ROUND(o_totalprice) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)) AS s3,
         SUM(CAST(CAST(ROUND(o_totalprice) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)
             * CAST(ROUND(o_totalprice) AS BIGINT)) AS s4
  FROM orders
),
mom AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM agg
),
cm AS (
  SELECT n,
         r2 - mean * mean AS m2,
         r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
         r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
            - 3.0 * mean * mean * mean * mean AS m4
  FROM mom
),
sk AS (
  SELECT n,
         m3 / SQRT(m2 * m2 * m2) AS skew,
         m4 / (m2 * m2) AS kurt
  FROM cm
)
SELECT n,
       CAST(ROUND(skew * 1000000) AS BIGINT) AS skew_micro,
       CAST(ROUND(kurt * 1000000) AS BIGINT) AS kurtosis_micro,
       CAST(ROUND(CAST(n AS DOUBLE) / 6.0
                  * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
                  * 1000) AS BIGINT) AS jb_milli
FROM sk
"""


def q_bollinger_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-band anomaly detection on the daily revenue series: a
    day is anomalous when it sits more than 2σ from the TRAILING
    20-day mean (current day excluded — no self-contamination), the
    Bollinger-band / local-z complement to mad_outliers (global
    robust) and cusum_top_days (cumulative drift). Window sums of the
    exact integer day totals (Σy, Σy² in decimal — day totals square
    past int64 at SF≈10) make mean/σ deterministic; z is one double
    expression quantized to micro. Scale: ONE keyed aggregate to the
    ≤365-row daily frame; the trailing window runs over that bounded
    frame only."""
    days = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    w = Window.orderBy("d").rowsBetween(-20, -1)
    ydec = F.col("y").cast("decimal(38,0)")
    banded = days.select(
        "d",
        "y",
        F.count("*").over(w).alias("wn"),
        F.sum("y").over(w).cast("long").alias("wsum"),
        F.sum(ydec * ydec).over(w).alias("wsumsq"),
    ).filter(F.col("wn") == 20)
    mean = F.col("wsum").cast("double") / F.col("wn")
    var = (
        F.col("wsumsq").cast("double")
        - F.col("wsum").cast("double") * F.col("wsum") / F.col("wn")
    ) / (F.col("wn") - F.lit(1))
    z = (F.col("y") - mean) / F.sqrt(var)
    return (
        banded.select(
            "d",
            "y",
            F.round(z * F.lit(1_000_000.0)).cast("long").alias("z_micro"),
        )
        .filter(F.abs(F.col("z_micro")) > 2_000_000)
        .orderBy("d")
    )


ORACLE_BOLLINGER_ANOMALY_DAYS = """
WITH days AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
banded AS (
  SELECT d, y,
         COUNT(*) OVER w AS wn,
         CAST(SUM(y) OVER w AS BIGINT) AS wsum,
         SUM(CAST(y AS HUGEINT) * y) OVER w AS wsumsq
  FROM days
  WINDOW w AS (ORDER BY d ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT d, y,
         CAST(ROUND((y - CAST(wsum AS DOUBLE) / wn)
                    / SQRT((CAST(wsumsq AS DOUBLE)
                            - CAST(wsum AS DOUBLE) * wsum / wn)
                           / (wn - 1))
                    * 1000000) AS BIGINT) AS z_micro
  FROM banded WHERE wn = 20
)
SELECT d, y, z_micro FROM scored
WHERE ABS(z_micro) > 2000000 ORDER BY d
"""


EXTRA_QUERIES.update(
    {
        "jarque_bera": (
            q_jarque_bera,
            ORACLE_JARQUE_BERA,
            "ext:Jarque-Bera normality test (exact decimal power sums,"
            " moment algebra in double)",
        ),
        "bollinger_anomaly_days": (
            q_bollinger_anomaly_days,
            ORACLE_BOLLINGER_ANOMALY_DAYS,
            "ext:trailing-band local-z anomaly days (Bollinger, exact"
            " window sums, self-excluded)",
        ),
    }
)


def q_misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heavy hitters via Misra-Gries (sketches.
    misra_gries_candidates) with the guarantee HARD-CHECKED in-query:
    candidates come from the single-pass bounded-memory summary
    (O(k) state per partition — the 100 TB-stream shape), exact counts
    come from one keyed aggregate, and the query RAISES unless (a)
    every token with true count > N/(k+1) is among the candidates
    (the MG coverage guarantee), and (b) no merged counter overcounts
    its true frequency. Emitted rows are the TRUE heavy hitters with
    exact counts — partitioning-independent, so the DuckDB oracle
    recomputes them directly; the sketch's correctness is what the
    equality certifies (the lsh_topk_checked pattern)."""
    from yelp_etl_spark.functions.sketches import misra_gries_candidates
    from yelp_etl_spark.functions.text import portable_tokens

    from yelp_etl_spark.functions.checkpoint import truncate_lineage

    k = 40
    docs = _t(spark, sf_dir, "documents")
    toks = portable_tokens(docs, "doc_id", "text").localCheckpoint()
    n_total = toks.count()
    thresh = n_total // (k + 1)
    cand = misra_gries_candidates(toks, "tok", k)
    # vocabulary-sized; feeds both the guarantee check and the returned
    # frame — truncate lazily so the tokens are aggregated exactly once
    true_counts = truncate_lineage(
        toks.groupBy("tok").agg(F.count("*").cast("long").alias("n")),
        eager=False,
    )
    # both guarantee checks in ONE pass over the check join (previously
    # two separate limit(1).count() jobs — r15 optimization round)
    viol = true_counts.join(cand, "tok", "left").agg(
        F.sum(
            ((F.col("n") > thresh) & F.col("mg").isNull()).cast("long")
        ).alias("missed"),
        F.sum((F.col("mg") > F.col("n")).cast("long")).alias("over"),
    ).first()
    if viol["missed"]:
        raise ValueError("Misra-Gries coverage guarantee violated")
    if viol["over"]:
        raise ValueError("Misra-Gries counter overcounts true frequency")
    return (
        true_counts.filter(F.col("n") > thresh)
        .select(
            "tok",
            "n",
            F.lit(n_total).cast("long").alias("n_tokens"),
            F.lit(thresh).cast("long").alias("threshold"),
        )
        .orderBy(F.desc("n"), "tok")
    )


ORACLE_MISRA_GRIES_HEAVY_HITTERS = """
WITH toks AS MATERIALIZED (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
filtered AS (
  SELECT tok FROM toks WHERE tok != ''
),
counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM filtered GROUP BY tok
),
total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM filtered
)
SELECT tok, n, n_tokens,
       CAST(n_tokens // 41 AS BIGINT) AS threshold
FROM counts, total
WHERE n > n_tokens // 41
ORDER BY n DESC, tok
"""


EXTRA_QUERIES.update(
    {
        "misra_gries_heavy_hitters": (
            q_misra_gries_heavy_hitters,
            ORACLE_MISRA_GRIES_HEAVY_HITTERS,
            "ext:Misra-Gries deterministic heavy hitters (mergeable"
            " bounded-state summary, coverage guarantee hard-checked)",
        ),
    }
)


def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over a declared candidate set —
    the schema-profiling pass beside profile_columns (univariate) and
    dq_report (declared rules): for each candidate A→B, ONE keyed
    aggregate counts determinant groups, violating groups (>1 distinct
    B), and the worst fan-out; g3-style error = violating rows ppm.
    Candidates span PK-like (holds exactly), correlated (fails
    narrowly), and independent (fails wide) pairs so the output
    discriminates. Scale: one groupBy per candidate on its
    determinant — map-side-combinable, no windows, no joins."""
    checks = []
    specs = [
        ("orders", "o_orderkey", "o_orderstatus"),     # PK → holds
        ("orders", "o_custkey", "o_orderpriority"),    # repeat customers
        ("customer", "c_nationkey", "c_mktsegment"),   # independent
        ("lineitem", "l_partkey", "l_suppkey"),        # co-sourced parts
    ]
    for table, a, b in specs:
        t = _t(spark, sf_dir, table)
        g = t.groupBy(F.col(a)).agg(
            F.countDistinct(b).alias("nb"),
            F.count("*").alias("rows_g"),
        )
        checks.append(
            g.agg(
                F.lit(f"{table}.{a}->{b}").alias("candidate"),
                F.count("*").cast("long").alias("n_groups"),
                F.sum((F.col("nb") > 1).cast("long"))
                .cast("long")
                .alias("n_violating_groups"),
                F.max("nb").cast("long").alias("max_distinct_rhs"),
                F.sum("rows_g").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("nb") > 1, F.col("rows_g")).otherwise(0))
                .cast("long")
                .alias("violating_rows"),
            ).select(
                "candidate",
                "n_groups",
                "n_violating_groups",
                "max_distinct_rhs",
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * violating_rows)"
                    " DIV n_rows AS LONG)"
                ).alias("violation_ppm"),
                (F.col("n_violating_groups") == 0).alias("holds"),
            )
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("candidate")


ORACLE_FD_DISCOVERY = """
WITH g1 AS (
  SELECT o_orderkey AS a, COUNT(DISTINCT o_orderstatus) AS nb,
         COUNT(*) AS rows_g
  FROM orders GROUP BY 1
),
g2 AS (
  SELECT o_custkey AS a, COUNT(DISTINCT o_orderpriority) AS nb,
         COUNT(*) AS rows_g
  FROM orders GROUP BY 1
),
g3 AS (
  SELECT c_nationkey AS a, COUNT(DISTINCT c_mktsegment) AS nb,
         COUNT(*) AS rows_g
  FROM customer GROUP BY 1
),
g4 AS (
  SELECT l_partkey AS a, COUNT(DISTINCT l_suppkey) AS nb,
         COUNT(*) AS rows_g
  FROM lineitem GROUP BY 1
),
rolled AS (
  SELECT 'orders.o_orderkey->o_orderstatus' AS candidate, * FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(MAX(nb) AS BIGINT) AS max_distinct_rhs,
           CAST(SUM(rows_g) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN nb > 1 THEN rows_g ELSE 0 END) AS BIGINT)
             AS violating_rows
    FROM g1)
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority', * FROM (
    SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN nb > 1 THEN 1
             ELSE 0 END) AS BIGINT), CAST(MAX(nb) AS BIGINT),
           CAST(SUM(rows_g) AS BIGINT),
           CAST(SUM(CASE WHEN nb > 1 THEN rows_g ELSE 0 END) AS BIGINT)
    FROM g2)
  UNION ALL
  SELECT 'customer.c_nationkey->c_mktsegment', * FROM (
    SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN nb > 1 THEN 1
             ELSE 0 END) AS BIGINT), CAST(MAX(nb) AS BIGINT),
           CAST(SUM(rows_g) AS BIGINT),
           CAST(SUM(CASE WHEN nb > 1 THEN rows_g ELSE 0 END) AS BIGINT)
    FROM g3)
  UNION ALL
  SELECT 'lineitem.l_partkey->l_suppkey', * FROM (
    SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN nb > 1 THEN 1
             ELSE 0 END) AS BIGINT), CAST(MAX(nb) AS BIGINT),
           CAST(SUM(rows_g) AS BIGINT),
           CAST(SUM(CASE WHEN nb > 1 THEN rows_g ELSE 0 END) AS BIGINT)
    FROM g4)
)
SELECT candidate, n_groups, n_violating_groups, max_distinct_rhs,
       CAST((CAST(1000000 AS HUGEINT) * violating_rows) // n_rows
            AS BIGINT) AS violation_ppm,
       (n_violating_groups = 0) AS holds
FROM rolled ORDER BY candidate
"""


EXTRA_QUERIES.update(
    {
        "fd_discovery": (
            q_fd_discovery,
            ORACLE_FD_DISCOVERY,
            "ext:functional-dependency discovery (g3-style violation"
            " ppm over candidate determinants)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round-9 late additions, wave 8
# --------------------------------------------------------------------------


def q_wasserstein1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the
    quantity distributions of return flags A and N — the
    transport-cost drift metric beside psi_drift (needs bins) and
    ks_two_sample (sup-norm only): W₁ = ∫|F_A − F_B| dv = Σ over value
    gaps of |cum_A·n_B − cum_B·n_A|·gap on the common denominator
    n_A·n_B, all BIGINT (the t_closeness EMD machinery on a numeric
    axis with real gap widths). Scale: ONE keyed count to the ≤50-row
    value histogram; the gap window runs over that bounded frame."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
    )
    cells = li.groupBy(F.floor("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stepped = cells.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
        (F.lead("v", 1).over(Window.orderBy("v")) - F.col("v")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    # Per-term magnitude is ~n_a·n_b·gap (≥1e16 around SF10), so the
    # accumulation runs in decimal(38,0) — a plain BIGINT sum would
    # silently wrap under non-ANSI Spark while DuckDB's HUGEINT stays
    # exact (the welch_ttest/jarque_bera decimal convention).
    agg = stepped.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(
            F.abs(
                F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
                - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
            )
            * F.col("gap")
        )
        .cast("long")
        .alias("w1_num"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "w1_num",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * w1_num)"
            " DIV (n_a * n_b) AS LONG)"
        ).alias("w1_micro"),
    )


ORACLE_WASSERSTEIN1_DRIFT = """
WITH cells AS MATERIALIZED (
  SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1
),
stepped AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(ca) OVER () AS n_a,
         SUM(cb) OVER () AS n_b,
         LEAD(v, 1) OVER (ORDER BY v) - v AS gap
  FROM cells
)
SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(SUM(ABS(cum_a * n_b - cum_b * n_a) * gap) AS BIGINT) AS w1_num,
       CAST((CAST(1000000 AS HUGEINT)
             * CAST(SUM(ABS(cum_a * n_b - cum_b * n_a) * gap) AS BIGINT))
            // (MAX(n_a) * MAX(n_b)) AS BIGINT) AS w1_micro
FROM stepped WHERE gap IS NOT NULL
"""


def q_dunning_g2_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio (G²) collocations — the
    significance-tested phrase miner beside pmi_collocations (PMI
    over-rewards rare pairs; G² weighs evidence): for each adjacent
    bigram, the 2×2 contingency (k11 bigram count, k12/k21 marginal
    remainders, k22 rest) scores G² = 2·Σ O·ln(O/E). Each of the four
    O·ln(O/E) terms is quantized to micro-nats ONCE PER BIGRAM TYPE
    (the qlog discipline), so ranking and the top-20 cut are exact
    integer comparisons with deterministic tie-breaks. Scale: one
    bigram explode + keyed counts; the scoring join is model-sized."""
    from yelp_etl_spark.functions.text import portable_tokens

    docs = _t(spark, sf_dir, "documents")
    toks = portable_tokens(docs, "doc_id", "text", with_position=True)
    wpos = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.select("doc_id", "tok", F.row_number().over(wpos).alias("p"))
    t1 = seq.alias("t1")
    t2 = seq.alias("t2")
    bigrams = t1.join(
        t2,
        (F.col("t1.doc_id") == F.col("t2.doc_id"))
        & (F.col("t2.p") == F.col("t1.p") + 1),
    ).select(F.col("t1.tok").alias("a"), F.col("t2.tok").alias("b"))
    pair = bigrams.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("k11")
    )
    ra = pair.groupBy("a").agg(F.sum("k11").cast("long").alias("na"))
    rb = pair.groupBy("b").agg(F.sum("k11").cast("long").alias("nb"))
    tot = pair.agg(F.sum("k11").cast("long").alias("n"))
    cont = (
        pair.join(ra, "a")
        .join(rb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "k11",
            (F.col("na") - F.col("k11")).alias("k12"),
            (F.col("nb") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("na") - F.col("nb") + F.col("k11")).alias(
                "k22"
            ),
            "na",
            "nb",
            "n",
        )
    )

    def term(o: F.Column, row_sum: F.Column, col_sum: F.Column):
        # micro-nat quantized O·ln(O·n / (row·col)); 0·ln0 = 0
        return F.when(
            o > 0,
            F.round(
                o
                * F.log(
                    o.cast("double")
                    * F.col("n")
                    / (row_sum.cast("double") * col_sum)
                )
                * F.lit(1_000_000.0)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    k11, k12 = F.col("k11"), F.col("k12")
    k21, k22 = F.col("k21"), F.col("k22")
    na, nb, n = F.col("na"), F.col("nb"), F.col("n")
    g2 = 2 * (
        term(k11, na, nb)
        + term(k12, na, n - nb)
        + term(k21, n - na, nb)
        + term(k22, n - na, n - nb)
    )
    return (
        cont.select(
            "a", "b", "k11", g2.alias("g2_micro")
        )
        .orderBy(F.desc("g2_micro"), "a", "b")
        .limit(20)
    )


ORACLE_DUNNING_G2_COLLOCATIONS = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, u.tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY u.pos) AS p
  FROM (
    SELECT doc_id,
           unnest(string_split(LOWER(text), ' ')) AS tok,
           generate_subscripts(string_split(LOWER(text), ' '), 1) AS pos
    FROM documents
  ) u
  WHERE u.tok <> ''
),
bigrams AS MATERIALIZED (
  SELECT t1.tok AS a, t2.tok AS b
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.p = t1.p + 1
),
pair AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS k11 FROM bigrams GROUP BY a, b
),
ra AS (SELECT a, CAST(SUM(k11) AS BIGINT) AS na FROM pair GROUP BY a),
rb AS (SELECT b, CAST(SUM(k11) AS BIGINT) AS nb FROM pair GROUP BY b),
tot AS (SELECT CAST(SUM(k11) AS BIGINT) AS n FROM pair),
cont AS (
  SELECT p.a, p.b, p.k11, ra.na - p.k11 AS k12, rb.nb - p.k11 AS k21,
         t.n - ra.na - rb.nb + p.k11 AS k22, ra.na, rb.nb, t.n
  FROM pair p JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN tot t
),
scored AS (
  SELECT a, b, k11,
         2 * ((CASE WHEN k11 > 0 THEN CAST(ROUND(k11 * LN(CAST(k11 AS DOUBLE)
                * n / (CAST(na AS DOUBLE) * nb)) * 1000000) AS BIGINT)
               ELSE 0 END)
            + (CASE WHEN k12 > 0 THEN CAST(ROUND(k12 * LN(CAST(k12 AS DOUBLE)
                * n / (CAST(na AS DOUBLE) * (n - nb))) * 1000000) AS BIGINT)
               ELSE 0 END)
            + (CASE WHEN k21 > 0 THEN CAST(ROUND(k21 * LN(CAST(k21 AS DOUBLE)
                * n / (CAST(n - na AS DOUBLE) * nb)) * 1000000) AS BIGINT)
               ELSE 0 END)
            + (CASE WHEN k22 > 0 THEN CAST(ROUND(k22 * LN(CAST(k22 AS DOUBLE)
                * n / (CAST(n - na AS DOUBLE) * (n - nb))) * 1000000)
                AS BIGINT)
               ELSE 0 END)) AS g2_micro
  FROM cont
)
SELECT a, b, k11, g2_micro
FROM scored ORDER BY g2_micro DESC, a, b LIMIT 20
"""


EXTRA_QUERIES.update(
    {
        "wasserstein1_drift": (
            q_wasserstein1_drift,
            ORACLE_WASSERSTEIN1_DRIFT,
            "ext:exact 1-D Wasserstein-1 distribution drift (integer"
            " ECDF-area transport cost)",
        ),
        "dunning_g2_collocations": (
            q_dunning_g2_collocations,
            ORACLE_DUNNING_G2_COLLOCATIONS,
            "ext:Dunning G2 log-likelihood collocations (per-type"
            " micro-nat terms, deterministic top-20)",
        ),
    }
)


def q_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token diversity profile: Simpson concentration
    (Σnᵢ(nᵢ−1)/(N(N−1)) — the probability two random tokens match,
    EXACT rational kept as ppm integer division) and Shannon entropy
    (Σ−pᵢln pᵢ via the decomposed form ln N − Σnᵢ·ln nᵢ/N with each
    ln nᵢ quantized once per vocab TYPE — the qlog discipline), beside
    gini_concentration (value inequality) and heaps_law_fit (vocab
    growth): the corpus-mix dashboard row every curation run reports.
    Scale: one keyed (source, tok) count, one per-source rollup; no
    windows."""
    from yelp_etl_spark.functions.text import portable_tokens

    docs = _t(spark, sf_dir, "documents")
    toks = portable_tokens(docs, "doc_id", "text").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    vocab = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("ni")
    )
    per = vocab.groupBy("source").agg(
        F.sum("ni").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.col("ni") * (F.col("ni") - 1)).cast("long").alias("pairs"),
        F.sum(
            F.col("ni")
            * F.round(F.log("ni") * F.lit(1_000_000.0)).cast("long")
        )
        .cast("long")
        .alias("nlogn_micro"),
    )
    shannon = (
        F.round(F.log("n") * F.lit(1_000_000.0)).cast("long")
        - F.expr("CAST(nlogn_micro DIV n AS LONG)")
    )
    return per.select(
        "source",
        "n",
        "v",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * pairs)"
            " DIV (n * (n - 1)) AS LONG)"
        ).alias("simpson_ppm"),
        shannon.alias("shannon_micro"),
    ).orderBy("source")


ORACLE_DIVERSITY_INDICES = """
WITH toks AS MATERIALIZED (
  SELECT d.doc_id, d.source, t.tok
  FROM documents d,
       LATERAL (SELECT unnest(string_split(lower(d.text), ' ')) AS tok) t
  WHERE t.tok != ''
),
vocab AS MATERIALIZED (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS ni
  FROM toks GROUP BY 1, 2
),
per AS (
  SELECT source,
         CAST(SUM(ni) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(ni * (ni - 1)) AS BIGINT) AS pairs,
         CAST(SUM(ni * CAST(ROUND(LN(ni) * 1000000) AS BIGINT)) AS BIGINT)
           AS nlogn_micro
  FROM vocab GROUP BY source
)
SELECT source, n, v,
       CAST((CAST(1000000 AS HUGEINT) * pairs) // (n * (n - 1)) AS BIGINT)
         AS simpson_ppm,
       CAST(ROUND(LN(n) * 1000000) AS BIGINT) - (nlogn_micro // n)
         AS shannon_micro
FROM per ORDER BY source
"""


EXTRA_QUERIES.update(
    {
        "diversity_indices": (
            q_diversity_indices,
            ORACLE_DIVERSITY_INDICES,
            "ext:Simpson + Shannon corpus diversity per source (exact"
            " pair rational, per-type micro-nat entropy)",
        ),
    }
)
