"""Extension catalog — ml queries."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_etl_spark.sources.readers import load_table

from yelp_etl_spark.plans.ext._shared import (  # noqa: F401
    EXTRA_QUERIES,
    _GEO_SIDE,
    _pos_ctes,
    _t,
)



_KMEANS_K = 4
_KMEANS_ITERS = 3
_KMEANS_DIM = 64


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (functions/clustering.kmeans) over
    the embeddings table: first-k-by-id init, 3 exact update
    iterations, per-cluster sizes + inertia under the final centroids.
    The oracle runs the IDENTICAL unrolled iterations in DuckDB —
    centroid rounding after every update makes the cross-engine
    comparison robust to fp summation order, so every one of the 500
    assignments is effectively value-checked through 3 iterations."""
    from yelp_etl_spark.functions.clustering import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assign, _cent = kmeans(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        k=_KMEANS_K,
        iterations=_KMEANS_ITERS,
    )
    return assign.groupBy(F.col("cluster").cast("long").alias("cluster")).agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("dist2"), 4).alias("inertia"),
    )


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    """Generate the unrolled-iteration DuckDB twin. Every step CTE is
    AS MATERIALIZED — DuckDB inlines CTEs by default and a chain where
    step i references step i-1 repeatedly grows the plan exponentially
    (the BPE oracle lesson). pos is 0-based to match posexplode."""
    steps = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, range(1, {dim + 1}) t(i)
)""",
        f"""init_ids AS MATERIALIZED (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)""",
        """cent0 AS MATERIALIZED (
  SELECT c, pos, ROUND(x, 6) AS v FROM ex JOIN init_ids USING (vec_id)
)""",
    ]
    for n in range(1, iters + 1):
        steps.append(
            f"""d{n} AS MATERIALIZED (
  SELECT vec_id, c, SUM((x - v) * (x - v)) AS d
  FROM ex JOIN cent{n - 1} USING (pos) GROUP BY vec_id, c
)"""
        )
        steps.append(
            f"""a{n} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM d{n}
  ) WHERE rn = 1
)"""
        )
        steps.append(
            f"""cent{n} AS MATERIALIZED (
  SELECT c, pos, ROUND(AVG(x), 6) AS v
  FROM a{n} JOIN ex USING (vec_id) GROUP BY c, pos
)"""
        )
    steps.append(
        f"""dfin AS MATERIALIZED (
  SELECT vec_id, c, SUM((x - v) * (x - v)) AS d
  FROM ex JOIN cent{iters} USING (pos) GROUP BY vec_id, c
)"""
    )
    steps.append(
        """afin AS MATERIALIZED (
  SELECT vec_id, c, d FROM (
    SELECT vec_id, c, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dfin
  ) WHERE rn = 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + """
SELECT CAST(c AS BIGINT) AS cluster, COUNT(*) AS n_points,
       ROUND(SUM(d), 4) AS inertia
FROM afin GROUP BY c
"""
    )


ORACLE_KMEANS_CLUSTERS = _kmeans_oracle(_KMEANS_K, _KMEANS_ITERS, _KMEANS_DIM)


EXTRA_QUERIES.update(
    {
        "kmeans_clusters": (
            q_kmeans_clusters,
            ORACLE_KMEANS_CLUSTERS,
            "ext:iterative Lloyd's k-means over embeddings",
        ),
    }
)


_JL_OUT_DIM = 16
_JL_IN_DIM = 64


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16
    (functions/similarity.random_projection, deterministic md5-sign
    Rademacher matrix): projects every embedding and reports the JL
    quality envelope — per-vector norm-preservation ratio
    ‖Rx‖/‖x‖ aggregated over the corpus. The oracle rebuilds the SAME
    projection matrix cell-for-cell from the md5 convention and
    reproduces every projected component, so the whole projection is
    value-checked, not just its statistics' shape."""
    from yelp_etl_spark.functions.similarity import (
        random_projection,
        squared_norm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    proj = random_projection(
        emb, id_col="vec_id", vec_col="embedding", out_dim=_JL_OUT_DIM
    )
    orig = emb.select(
        "vec_id", squared_norm(F.col("embedding")).alias("n2")
    )
    ratio = (
        proj.join(orig, "vec_id")
        .select(
            "vec_id",
            F.sqrt(squared_norm(F.col("projected")) / F.col("n2")).alias("ratio"),
        )
    )
    return ratio.agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("ratio"), 4).alias("avg_ratio"),
        F.round(F.min("ratio"), 4).alias("min_ratio"),
        F.round(F.max("ratio"), 4).alias("max_ratio"),
    )


ORACLE_JL_PROJECTION = f"""
WITH comp AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, range(1, {_JL_IN_DIM + 1}) t(i)
),
sgn AS MATERIALIZED (
  SELECT p.pos, q.j,
         CAST((CAST(concat('0x', substr(md5(concat(p.pos, '_', q.j)), 18, 1))
                    AS INT) % 2) * 2 - 1 AS DOUBLE)
           / sqrt({_JL_OUT_DIM}.0) AS r
  FROM range(0, {_JL_IN_DIM}) p(pos), range(0, {_JL_OUT_DIM}) q(j)
),
proj AS MATERIALIZED (
  SELECT vec_id, j, SUM(x * r) AS y
  FROM comp JOIN sgn USING (pos) GROUP BY vec_id, j
),
norms AS MATERIALIZED (
  SELECT vec_id, SUM(x * x) AS n2 FROM comp GROUP BY vec_id
),
pn AS MATERIALIZED (
  SELECT vec_id, SUM(y * y) AS p2 FROM proj GROUP BY vec_id
),
ratios AS MATERIALIZED (
  SELECT pn.vec_id, sqrt(p2 / n2) AS ratio
  FROM pn JOIN norms ON pn.vec_id = norms.vec_id
)
SELECT COUNT(*) AS n_vecs,
       ROUND(AVG(ratio), 4) AS avg_ratio,
       ROUND(MIN(ratio), 4) AS min_ratio,
       ROUND(MAX(ratio), 4) AS max_ratio
FROM ratios
"""


EXTRA_QUERIES.update(
    {
        "jl_projection": (
            q_jl_projection,
            ORACLE_JL_PROJECTION,
            "ext:Johnson-Lindenstrauss deterministic random projection",
        ),
    }
)


_PCA_ITERS = 5
_PCA_DIM = 64


def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embeddings by matrix-free power
    iteration (functions/clustering.power_iteration_pca): 5 exact
    rounds, per-round rounding for cross-engine bit-parity, largest-
    coordinate-positive sign convention. Returns all 64 loadings plus
    the eigenvalue and explained-variance ratio; the DuckDB oracle
    replays the identical unrolled rounds, so the whole eigenvector is
    value-checked, not just a summary."""
    from yelp_etl_spark.functions.clustering import power_iteration_pca

    emb = _t(spark, sf_dir, "embeddings")
    loadings, eig, total = power_iteration_pca(
        emb, id_col="vec_id", vec_col="embedding", iterations=_PCA_ITERS
    )
    return loadings.select(
        "pos",
        "loading",
        F.lit(round(eig, 4)).alias("eigenvalue"),
        F.lit(round(eig / total, 4)).alias("explained_ratio"),
    )


def _pca_oracle(iters: int, dim: int) -> str:
    """Unrolled power-iteration twin (materialized CTEs; scalar values
    carried via CROSS JOIN single-row tables, never repeated scalar
    subqueries — the BPE oracle lessons)."""
    steps = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, range(1, {dim + 1}) t(i)
)""",
        """mu AS MATERIALIZED (
  SELECT pos, ROUND(AVG(x), 6) AS mu FROM ex GROUP BY pos
)""",
        """xc AS MATERIALIZED (
  SELECT vec_id, ex.pos, x - mu AS x FROM ex JOIN mu USING (pos)
)""",
        """nn AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n FROM xc
)""",
        """v0 AS MATERIALIZED (
  SELECT pos, CASE WHEN pos = 0 THEN 1.0 ELSE 0.0 END AS v
  FROM range(0, 64) t(pos)
)""".replace("64", str(dim)),
    ]
    for k in range(1, iters + 1):
        steps.append(
            f"""t{k} AS MATERIALIZED (
  SELECT vec_id, SUM(x * v) AS t
  FROM xc JOIN v{k - 1} USING (pos) GROUP BY vec_id
)"""
        )
        steps.append(
            f"""w{k} AS MATERIALIZED (
  SELECT pos, SUM(x * t) / n AS w
  FROM xc JOIN t{k} USING (vec_id) CROSS JOIN nn GROUP BY pos, n
)"""
        )
        steps.append(
            f"""nrm{k} AS MATERIALIZED (
  SELECT sqrt(SUM(w * w)) AS nrm FROM w{k}
)"""
        )
        steps.append(
            f"""v{k} AS MATERIALIZED (
  SELECT pos, ROUND(w / nrm, 6) AS v FROM w{k} CROSS JOIN nrm{k}
)"""
        )
    steps.append(
        f"""sgn AS MATERIALIZED (
  SELECT CASE WHEN (
    SELECT v FROM v{iters} ORDER BY abs(v) DESC, pos LIMIT 1
  ) < 0 THEN -1.0 ELSE 1.0 END AS s
)"""
    )
    steps.append(
        f"""vf AS MATERIALIZED (
  SELECT pos, CASE WHEN v = 0 THEN 0.0 ELSE v * s END AS v
  FROM v{iters} CROSS JOIN sgn
)"""
    )
    steps.append(
        """tf AS MATERIALIZED (
  SELECT vec_id, SUM(x * v) AS t FROM xc JOIN vf USING (pos) GROUP BY vec_id
)"""
    )
    steps.append(
        """wf AS MATERIALIZED (
  SELECT pos, SUM(x * t) / n AS w
  FROM xc JOIN tf USING (vec_id) CROSS JOIN nn GROUP BY pos, n
)"""
    )
    steps.append(
        """scal AS MATERIALIZED (
  SELECT ROUND(SUM(vf.v * wf.w), 4) AS eigenvalue,
         ROUND(SUM(vf.v * wf.w)
               / (SELECT SUM(x * x) / n FROM xc CROSS JOIN nn GROUP BY n),
               4) AS explained_ratio
  FROM vf JOIN wf USING (pos)
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + """
SELECT pos, v AS loading, eigenvalue, explained_ratio
FROM vf CROSS JOIN scal
"""
    )


ORACLE_PCA_TOP_COMPONENT = _pca_oracle(_PCA_ITERS, _PCA_DIM)


EXTRA_QUERIES.update(
    {
        "pca_top_component": (
            q_pca_top_component,
            ORACLE_PCA_TOP_COMPONENT,
            "ext:matrix-free power-iteration PCA top component",
        ),
    }
)


_FH_N_FEATURES = 256


def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing (functions/text.hashed_features) over the
    documents table at 256 buckets: the sparse cell table reduced to
    per-feature aggregates for the 25 most-populated buckets (doc
    frequency, then feature id as the total-order tiebreak). Both
    hashes use the portable md5 convention, so the oracle rebuilds
    every ±1 contribution exactly — collisions and cancellations
    included."""
    from yelp_etl_spark.functions.text import hashed_features

    docs = _t(spark, sf_dir, "documents")
    cells = hashed_features(
        docs, id_column="doc_id", text_column="text",
        n_features=_FH_N_FEATURES,
    )
    return (
        cells.groupBy("feature")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("value").cast("long").alias("sum_value"),
            F.sum(F.abs("value")).cast("long").alias("sum_abs"),
        )
        .orderBy(F.desc("n_docs"), "feature")
        .limit(25)
    )


ORACLE_HASHED_FEATURES = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL unnest(string_split(LOWER(text), ' ')) AS t(tok)
  WHERE t.tok <> ''
),
hashed AS MATERIALIZED (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 18, 15)) AS BIGINT)
           % {_FH_N_FEATURES} AS feature,
         CASE WHEN CAST(concat('0x', substr(md5(tok), 17, 1)) AS BIGINT) % 2
                   = 1
              THEN 1 ELSE -1 END AS s
  FROM toks
),
cells AS MATERIALIZED (
  SELECT doc_id, feature, CAST(SUM(s) AS BIGINT) AS value
  FROM hashed GROUP BY doc_id, feature
)
SELECT feature, COUNT(*) AS n_docs,
       CAST(SUM(value) AS BIGINT) AS sum_value,
       CAST(SUM(ABS(value)) AS BIGINT) AS sum_abs
FROM cells GROUP BY feature
ORDER BY n_docs DESC, feature LIMIT 25
"""


EXTRA_QUERIES.update(
    {
        "hashed_features": (
            q_hashed_features,
            ORACLE_HASHED_FEATURES,
            "ext:signed feature hashing (vocabulary-free featurizer)",
        ),
    }
)


def q_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language tagger (functions/classify.py):
    train on the deterministic 80% doc_id split, predict lang on the
    held-out 20%, return the confusion matrix (true_lang, pred_lang,
    n_docs). Log-likelihoods are quantized to integer micro-nats
    before summation, so every per-document score is an exact BIGINT
    the oracle rebuilds term-for-term — argmax included."""
    from yelp_etl_spark.functions.classify import (
        naive_bayes_predict,
        naive_bayes_train,
    )
    from yelp_etl_spark.functions.sampling import train_test_split

    docs = _t(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", 0.8)
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    priors, loglik = naive_bayes_train(train, label_column="lang")
    pred = naive_bayes_predict(test, priors, loglik)
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(
            F.col("lang").alias("true_lang"),
            F.col("label").alias("pred_lang"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# The 80% md5-prefix split boundary — derived from the SAME helper the
# Spark side uses (4 hex digits; an 8-digit rewrite would diverge on
# keys whose 4-digit prefix equals the cut's).
from yelp_etl_spark.functions.sampling import HEX_DIGITS as _NB_DIGITS
from yelp_etl_spark.functions.sampling import fraction_threshold as _nb_cut

ORACLE_NAIVE_BAYES = f"""
WITH split AS MATERIALIZED (
  SELECT *,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, {_NB_DIGITS})
                   < '{_nb_cut(0.8)}'
              THEN 'train' ELSE 'test' END AS split
  FROM documents
),
train_toks AS MATERIALIZED (
  SELECT s.lang AS label, u.tok
  FROM split s, LATERAL unnest(string_split(LOWER(s.text), ' ')) AS u(tok)
  WHERE s.split = 'train' AND u.tok <> ''
),
pair AS MATERIALIZED (
  SELECT label, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM train_toks GROUP BY label, tok
),
totals AS MATERIALIZED (
  SELECT label, CAST(SUM(c) AS BIGINT) AS total_c FROM pair GROUP BY label
),
vocab AS MATERIALIZED (SELECT DISTINCT tok FROM pair),
vsize AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
grid AS MATERIALIZED (
  SELECT vo.tok, t.label,
         CAST(ROUND(LN(CAST(COALESCE(p.c, 0) + 1 AS DOUBLE)
                       / (t.total_c + vs.v)) * 1000000) AS BIGINT) AS loglik_q
  FROM vocab vo
  CROSS JOIN totals t
  LEFT JOIN pair p ON p.label = t.label AND p.tok = vo.tok
  CROSS JOIN vsize vs
),
priors AS MATERIALIZED (
  SELECT label, CAST(ROUND(LN(CAST(n_l AS DOUBLE) / n) * 1000000) AS BIGINT)
           AS prior_q
  FROM (SELECT lang AS label, CAST(COUNT(*) AS BIGINT) AS n_l
        FROM split WHERE split = 'train' GROUP BY lang)
  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM split WHERE split = 'train')
),
test_toks AS MATERIALIZED (
  SELECT s.doc_id, u.tok
  FROM split s, LATERAL unnest(string_split(LOWER(s.text), ' ')) AS u(tok)
  WHERE s.split = 'test' AND u.tok <> ''
),
tok_scores AS MATERIALIZED (
  SELECT tt.doc_id, g.label, CAST(SUM(g.loglik_q) AS BIGINT) AS tok_q
  FROM test_toks tt JOIN grid g ON g.tok = tt.tok
  GROUP BY tt.doc_id, g.label
),
scored AS MATERIALIZED (
  SELECT d.doc_id, pr.label,
         pr.prior_q + COALESCE(ts.tok_q, 0) AS score_q
  FROM (SELECT doc_id FROM split WHERE split = 'test') d
  CROSS JOIN priors pr
  LEFT JOIN tok_scores ts
    ON ts.doc_id = d.doc_id AND ts.label = pr.label
),
pred AS MATERIALIZED (
  SELECT doc_id, label
  FROM (SELECT doc_id, label,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_q DESC, label ASC) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT d.lang AS true_lang, p.label AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred p JOIN documents d USING (doc_id)
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


def q_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact midrank ROC-AUC (functions/evaluation.auc_score) of
    document length as a ranker for lang='en' — the Mann-Whitney U
    statistic in pure BIGINT arithmetic until one final division, so
    the single output row is bit-identical in any engine."""
    from yelp_etl_spark.functions.evaluation import auc_score

    docs = _t(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("int").alias("label"),
        F.col("n_chars").alias("score"),
    )
    return auc_score(docs, "label", "score")


ORACLE_AUC_SCORE = """
WITH g AS MATERIALIZED (
  SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM documents GROUP BY n_chars
),
ranked AS MATERIALIZED (
  SELECT cnt, pos,
         CAST(SUM(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - cnt
              AS BIGINT) AS before
  FROM g
),
agg AS MATERIALIZED (
  SELECT SUM(CAST(pos AS HUGEINT) * (2 * before + cnt + 1)) AS two_r_pos,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt) AS BIGINT) AS n
  FROM ranked
)
SELECT ROUND(CAST(two_r_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)),
             6) AS auc,
       n_pos, n - n_pos AS n_neg
FROM agg
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift monitor (functions/evaluation.psi_drift): event value
    distribution, first half of January vs the rest, 10 fixed bins
    over [0, 100] (top bin clamps the tail). Per-bin smoothed terms;
    every count exact, every float term a single fixed expression
    tree."""
    from yelp_etl_spark.functions.evaluation import psi_drift

    events = _t(spark, sf_dir, "events")
    pivot = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return psi_drift(
        events.filter(F.col("ts") < pivot),
        events.filter(F.col("ts") >= pivot),
        "value",
        lo=0.0,
        hi=100.0,
        n_bins=10,
    )


ORACLE_PSI_DRIFT = """
WITH base AS MATERIALIZED (
  SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 10.0), 0), 9) AS BIGINT)
           AS bin
  FROM events
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    AND value IS NOT NULL AND NOT isnan(value)
),
cur AS MATERIALIZED (
  SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 10.0), 0), 9) AS BIGINT)
           AS bin
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    AND value IS NOT NULL AND NOT isnan(value)
),
ba AS MATERIALIZED (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_base FROM base GROUP BY bin
),
cu AS MATERIALIZED (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_cur FROM cur GROUP BY bin
),
tots AS MATERIALIZED (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS tot_base,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cur) AS tot_cur
),
bins AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS bin FROM range(10))
SELECT b.bin,
       CAST(COALESCE(ba.n_base, 0) AS BIGINT) AS n_base,
       CAST(COALESCE(cu.n_cur, 0) AS BIGINT) AS n_cur,
       ROUND((CAST(COALESCE(ba.n_base, 0) + 1 AS DOUBLE) / (t.tot_base + 10)
              - CAST(COALESCE(cu.n_cur, 0) + 1 AS DOUBLE) / (t.tot_cur + 10))
             * LN((CAST(COALESCE(ba.n_base, 0) + 1 AS DOUBLE)
                   / (t.tot_base + 10))
                  / (CAST(COALESCE(cu.n_cur, 0) + 1 AS DOUBLE)
                     / (t.tot_cur + 10))), 6) AS psi_term
FROM bins b
LEFT JOIN ba ON ba.bin = b.bin
LEFT JOIN cu ON cu.bin = b.bin
CROSS JOIN tots t
ORDER BY b.bin
"""


EXTRA_QUERIES.update(
    {
        "naive_bayes_confusion": (
            q_naive_bayes_confusion,
            ORACLE_NAIVE_BAYES,
            "ext:multinomial NB language tagger (quantized log-lik)",
        ),
        "auc_score": (
            q_auc_score,
            ORACLE_AUC_SCORE,
            "ext:exact midrank ROC-AUC (Mann-Whitney U)",
        ),
        "psi_drift": (
            q_psi_drift,
            ORACLE_PSI_DRIFT,
            "ext:PSI distribution drift monitor",
        ),
    }
)


_LOGREG_ITERS = 4
_LOGREG_DIM = 64


def q_logreg_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary logistic regression by distributed full-batch gradient
    descent (functions/classify.logistic_regression_train): 4 exact
    rounds on the embeddings with y = (label < 5), lr = 1, zero
    init, per-round rounding. Returns all 64 weights + the bias
    (pos −1) + training accuracy — the DuckDB oracle replays the
    identical unrolled rounds, so the whole model is value-checked."""
    from yelp_etl_spark.functions.classify import logistic_regression_train

    emb = _t(spark, sf_dir, "embeddings")
    labels = emb.select(
        "vec_id", (F.col("label") < 5).cast("double").alias("y")
    )
    w, acc = logistic_regression_train(
        emb, labels, iterations=_LOGREG_ITERS, lr=1.0
    )
    return (
        spark.createDataFrame(w, "pos int, weight double")
        .select("pos", "weight", F.lit(acc).alias("accuracy"))
        .orderBy("pos")
    )


def _logreg_oracle(iters: int, dim: int) -> str:
    """Unrolled gradient-descent twin (materialized CTEs, scalar
    values via CROSS JOIN single-row tables — the BPE oracle
    lessons). Mirrors logistic_regression_train round for round."""
    steps = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, range(1, {dim + 1}) t(i)
  UNION ALL
  SELECT vec_id, -1 AS pos, 1.0 AS x FROM embeddings
)""",
        """ylab AS MATERIALIZED (
  SELECT vec_id, CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
)""",
        """nn AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ylab
)""",
        f"""w0 AS MATERIALIZED (
  SELECT CAST(pos AS INTEGER) AS pos, 0.0 AS w FROM range(-1, {dim}) t(pos)
)""",
    ]
    for k in range(1, iters + 1):
        steps.append(
            f"""z{k} AS MATERIALIZED (
  SELECT vec_id, ROUND(SUM(x * w), 6) AS z
  FROM ex JOIN w{k - 1} USING (pos) GROUP BY vec_id
)"""
        )
        steps.append(
            f"""r{k} AS MATERIALIZED (
  SELECT z.vec_id, ROUND(1.0 / (1.0 + EXP(-z.z)), 6) - y.y AS r
  FROM z{k} z JOIN ylab y USING (vec_id)
)"""
        )
        steps.append(
            f"""g{k} AS MATERIALIZED (
  SELECT pos, ROUND(SUM(x * r) / n, 6) AS g
  FROM ex JOIN r{k} USING (vec_id) CROSS JOIN nn GROUP BY pos, n
)"""
        )
        steps.append(
            f"""w{k} AS MATERIALIZED (
  SELECT w.pos, ROUND(w.w - COALESCE(g.g, 0), 6) AS w
  FROM w{k - 1} w LEFT JOIN g{k} g USING (pos)
)"""
        )
    steps.append(
        f"""zf AS MATERIALIZED (
  SELECT vec_id, ROUND(SUM(x * w), 6) AS z
  FROM ex JOIN w{iters} USING (pos) GROUP BY vec_id
)"""
    )
    steps.append(
        """acc AS MATERIALIZED (
  SELECT ROUND(CAST(SUM(CASE WHEN (CASE WHEN z >= 0 THEN 1.0 ELSE 0.0 END) = y
                              THEN 1 ELSE 0 END) AS DOUBLE) / n, 6) AS accuracy
  FROM zf JOIN ylab USING (vec_id) CROSS JOIN nn GROUP BY n
)"""
    )
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT pos, w AS weight, accuracy
FROM w{iters} CROSS JOIN acc
ORDER BY pos
"""
    )


ORACLE_LOGREG = _logreg_oracle(_LOGREG_ITERS, _LOGREG_DIM)


EXTRA_QUERIES.update(
    {
        "logreg_weights": (
            q_logreg_weights,
            ORACLE_LOGREG,
            "ext:distributed logistic regression (unrolled GD oracle)",
        ),
    }
)


def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metric closing the ANN loop: per-query
    recall@5 of the hyperplane-LSH index against the exact brute-force
    cosine top-5 (same query set as lsh_topk_checked, vec_id % 101 =
    0). Both sides run in-engine — ground truth is never collected —
    and the overlap count joins on (query, neighbor), so the metric
    stays a keyed-join DataFrame at any corpus size. recall = overlap
    / k is one exact small-int division. At 100 TB the ground truth is
    the expensive side (brute force is O(|queries|·n)): evaluate on a
    FIXED query sample (constant |queries|), which makes the whole
    metric linear in n — the modulus filter here plays that role."""
    from yelp_etl_spark.functions import similarity as S

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    brute = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    lsh = S.lsh_topk(emb, queries, dim=64, k=5, n_planes=8, seed=42).select(
        "query_id", "neighbor_id"
    )
    overlap = (
        brute.join(lsh, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    qids = brute.select("query_id").distinct()
    return (
        qids.join(overlap, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) / F.lit(5.0)).alias(
                "recall_at_5"
            ),
        )
        .orderBy("query_id")
    )


def _oracle_ann_recall(dim: int = 64, n_planes: int = 8, seed: int = 42,
                       k: int = 5) -> str:
    """Brute-force and LSH top-k rebuilt side by side (the same CTE
    bodies as their individually-green oracle twins), intersected for
    the per-query overlap."""
    from yelp_etl_spark.functions.similarity import (
        cosine_sim_sql,
        lsh_bucket_sql,
    )

    bucket = lsh_bucket_sql(dim, n_planes, seed)
    cos = cosine_sim_sql("q", "c")
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
brute AS MATERIALIZED (
  SELECT query_id, neighbor_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC,
                                              neighbor_id ASC) AS rank
        FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     {cos} AS cosine_sim
              FROM v q JOIN v c ON c.vec_id <> q.vec_id
              WHERE q.vec_id % 101 = 0))
  WHERE rank <= {k}
),
h AS MATERIALIZED (
  SELECT vec_id, emb, {bucket} AS bucket FROM v
),
lsh AS MATERIALIZED (
  SELECT query_id, neighbor_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC,
                                              neighbor_id ASC) AS rank
        FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     {cos} AS cosine_sim
              FROM h q JOIN h c
                ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
              WHERE q.vec_id % 101 = 0))
  WHERE rank <= {k}
),
overlap AS MATERIALIZED (
  SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM brute b JOIN lsh l
    ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(o.n_overlap, 0) / 5.0 AS recall_at_5
FROM (SELECT DISTINCT query_id FROM brute) q
LEFT JOIN overlap o ON o.query_id = q.query_id
ORDER BY q.query_id
"""


EXTRA_QUERIES.update(
    {
        "ann_recall_at_k": (
            q_ann_recall_at_k,
            _oracle_ann_recall(),
            "ext:ANN recall@k vs exact brute force (in-engine)",
        ),
    }
)


def q_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve (functions/evaluation.reliability_bins) of a
    deterministic logistic length scorer for lang='en': per-bin
    observed rate vs mean predicted probability. Probabilities are
    micro-unit-quantized before summation so every bin statistic is
    engine-exact."""
    from yelp_etl_spark.functions.evaluation import reliability_bins

    docs = _t(spark, sf_dir, "documents").select(
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-(F.col("n_chars") - F.lit(298)).cast("double") / F.lit(100.0))
            )
        ).alias("p"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return reliability_bins(docs, "p", "y", n_bins=10)


ORACLE_RELIABILITY_BINS = """
WITH scored AS MATERIALIZED (
  SELECT 1.0 / (1.0 + EXP(-CAST(n_chars - 298 AS DOUBLE) / 100.0)) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
cells AS MATERIALIZED (
  SELECT CAST(LEAST(GREATEST(FLOOR((p - 0.0) / 0.1), 0), 9) AS BIGINT) AS bin,
         CAST(ROUND(p * 1000000) AS BIGINT) AS p_q,
         y
  FROM scored
  WHERE p IS NOT NULL AND NOT isnan(p) AND y IS NOT NULL
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       ROUND(CAST(CAST(SUM(p_q) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS mean_p,
       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS obs_rate,
       ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             - CAST(CAST(SUM(p_q) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS gap
FROM cells
GROUP BY bin
ORDER BY bin
"""


EXTRA_QUERIES.update(
    {
        "reliability_bins": (
            q_reliability_bins,
            ORACLE_RELIABILITY_BINS,
            "ext:calibration/reliability curve (quantized bin stats)",
        ),
    }
)


def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training triplets (functions/dedup.contrastive_pairs):
    near-dup positives + deterministic hash-bucket negatives, ordered
    by (anchor, positive) with the jaccard carried for curriculum
    weighting."""
    from yelp_etl_spark.functions.dedup import contrastive_pairs

    docs = _t(spark, sf_dir, "documents")
    return contrastive_pairs(docs, n=3, threshold=0.2, n_buckets=64).orderBy(
        "anchor", "positive"
    )


ORACLE_CONTRASTIVE_PAIRS = (
    "WITH " + _pos_ctes(0.2) + """,
mins AS MATERIALIZED (
  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))
              AS BIGINT) % 64 AS bkt,
         MIN(doc_id) AS negative
  FROM documents GROUP BY 1
),
cand AS MATERIALIZED (
  SELECT p.id_a AS anchor, p.id_b AS positive, m.negative, p.jaccard
  FROM pos p
  JOIN mins m
    ON m.bkt = (CAST(concat('0x', substr(md5(CAST(p.id_a AS VARCHAR)), 18, 15))
                     AS BIGINT) + 1) % 64
  WHERE m.negative <> p.id_a AND m.negative <> p.id_b
)
SELECT anchor, positive, negative, jaccard
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM pos q
  WHERE (q.id_a = c.anchor AND q.id_b = c.negative)
     OR (q.id_b = c.anchor AND q.id_a = c.negative)
)
ORDER BY anchor, positive
"""
)


EXTRA_QUERIES.update(
    {
        "contrastive_pairs": (
            q_contrastive_pairs,
            ORACLE_CONTRASTIVE_PAIRS,
            "ext:contrastive training triplets (deterministic negatives)",
        ),
    }
)


def _brand_baskets(spark: SparkSession, sf_dir: str):
    """(basket, brand) pairs + eager basket count — the ONE definition
    of a market basket shared by q_assoc_rules and q_apriori_triples
    (a second copy is how two miners silently diverge on what a
    basket means). The frame is materialized once (truncate_lineage):
    both miners reference it from many join branches, and the count
    doubles as the materialization action."""
    from yelp_etl_spark.functions.checkpoint import truncate_lineage

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = truncate_lineage(
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct(),
        eager=True,
    )
    n_orders = baskets.select("l_orderkey").distinct().count()
    return baskets, n_orders


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the market-basket
    layer above q_copurchase_pairs): baskets are distinct
    (order, brand) pairs via the part dim (broadcast join); directed
    rules A→B get support, confidence = sup/cnt(A), and lift =
    conf/(cnt(B)/N). Ratios are emitted as FLOOR(1e6·x) parts-per-
    million — both engines floor the SAME IEEE double, the repo's
    cross-engine division convention (Spark double→long casts
    truncate, DuckDB's round; FLOOR on both sides is exact).

    Scale shape: the basket self-join co-partitions on the order key
    and is bounded by per-order basket size (brand count ≤ items); the
    rule aggregate shuffles on the (A,B) pair — at most |brands|² cells
    after map-side combine, metadata-sized regardless of order count.
    The single-row order total broadcasts. Top-30 fully tie-broken."""
    baskets, n_orders = _brand_baskets(spark, sf_dir)
    item_counts = baskets.groupBy("p_brand").agg(F.count("*").alias("cnt"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    sup = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") != F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("ante"), F.col("b.p_brand").alias("cons")
        )
        .agg(F.count("*").alias("sup"))
    )
    ca = item_counts.select(
        F.col("p_brand").alias("ante"), F.col("cnt").alias("cnt_a")
    )
    cb = item_counts.select(
        F.col("p_brand").alias("cons"), F.col("cnt").alias("cnt_b")
    )
    rules = (
        sup.join(F.broadcast(ca), "ante")
        .join(F.broadcast(cb), "cons")
        .select(
            "ante",
            "cons",
            F.col("sup").cast("long").alias("sup"),
            F.floor(
                F.lit(1000000.0) * F.col("sup") / F.col("cnt_a")
            ).cast("long").alias("conf_ppm"),
            # cnt_a/cnt_b go through double BEFORE multiplying: a
            # BIGINT*BIGINT product overflows under ANSI once per-brand
            # counts pass ~3e9 (the numerator is already double)
            F.floor(
                F.lit(1000000.0)
                * F.col("sup")
                * F.lit(float(n_orders))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b"))
            ).cast("long").alias("lift_ppm"),
        )
    )
    return rules.orderBy(F.desc("sup"), "ante", "cons").limit(30)


ORACLE_ASSOC_RULES = """
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
item_counts AS MATERIALIZED (
  SELECT p_brand, COUNT(*) AS cnt FROM baskets GROUP BY 1
),
n AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM baskets
),
sup AS MATERIALIZED (
  SELECT a.p_brand AS ante, b.p_brand AS cons, COUNT(*) AS sup
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY 1, 2
)
SELECT ante, cons, CAST(sup AS BIGINT) AS sup,
       CAST(FLOOR(1000000.0 * sup / ca.cnt) AS BIGINT) AS conf_ppm,
       CAST(FLOOR(1000000.0 * sup * (SELECT n_orders FROM n)
                  / (CAST(ca.cnt AS DOUBLE) * cb.cnt)) AS BIGINT) AS lift_ppm
FROM sup
JOIN item_counts ca ON ca.p_brand = sup.ante
JOIN item_counts cb ON cb.p_brand = sup.cons
ORDER BY sup DESC, ante, cons
LIMIT 30
"""


EXTRA_QUERIES.update(
    {
        "assoc_rules": (
            q_assoc_rules,
            ORACLE_ASSOC_RULES,
            "ext:market-basket association rules (support/conf/lift)",
        ),
    }
)


def q_als_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed recommender training: rank-2 ALS over the
    (customer, brand, Σquantity) ratings matrix
    (functions/recommend.py als_rank2) — 2 fixed alternating rounds,
    closed-form 2×2 regularized solves, every moment sum exact
    decimal, every division a FLOOR of the identical double
    expression. The oracle replays BOTH training rounds (user solve ⇄
    item solve) in unrolled SQL, so the driver hash pins the entire
    optimization trajectory, not just a final score — the same
    discipline as logreg_weights/kmeans_clusters. The |items|-row
    factor table is the model a serving layer broadcasts."""
    from yelp_etl_spark.functions.recommend import als_rank2

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ratings = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("o_custkey", "p_brand")
        .agg(F.sum("l_quantity").cast("long").alias("rating"))
    )
    return (
        als_rank2(ratings, "o_custkey", "p_brand", "rating", iterations=2)
        .select(F.col("item").alias("brand"), "q1", "q2")
        .orderBy("brand")
    )


def _als_solve_sql(prev: str, solve_key: str, join_key: str, out: str) -> str:
    """One ALS half-round as SQL: regularized 2×2 adjugate solve per
    ``solve_key`` with the ``prev`` factor table fixed on
    ``join_key``. Mirrors recommend._solve term for term (HUGEINT
    sums ≡ Spark decimal(38,0); identical double operand order)."""
    return f"""{out}_agg AS MATERIALIZED (
  SELECT r.{solve_key} AS k,
         SUM(CAST(f.q1 AS HUGEINT) * CAST(f.q1 AS HUGEINT)) AS a,
         SUM(CAST(f.q1 AS HUGEINT) * CAST(f.q2 AS HUGEINT)) AS b,
         SUM(CAST(f.q2 AS HUGEINT) * CAST(f.q2 AS HUGEINT)) AS c,
         SUM(CAST(r.rating AS HUGEINT) * CAST(f.q1 AS HUGEINT)) AS d1,
         SUM(CAST(r.rating AS HUGEINT) * CAST(f.q2 AS HUGEINT)) AS d2
  FROM ratings r JOIN {prev} f ON r.{join_key} = f.k
  GROUP BY 1
),
{out} AS MATERIALIZED (
  SELECT k,
         CAST(FLOOR((1000000000000.0
                     * (CAST(c + 100000000000 AS DOUBLE) * CAST(d1 AS DOUBLE)
                        - CAST(b AS DOUBLE) * CAST(d2 AS DOUBLE)))
                    / (CAST(a + 100000000000 AS DOUBLE)
                       * CAST(c + 100000000000 AS DOUBLE)
                       - CAST(b AS DOUBLE) * CAST(b AS DOUBLE)))
              AS BIGINT) AS q1,
         CAST(FLOOR((1000000000000.0
                     * (CAST(a + 100000000000 AS DOUBLE) * CAST(d2 AS DOUBLE)
                        - CAST(b AS DOUBLE) * CAST(d1 AS DOUBLE)))
                    / (CAST(a + 100000000000 AS DOUBLE)
                       * CAST(c + 100000000000 AS DOUBLE)
                       - CAST(b AS DOUBLE) * CAST(b AS DOUBLE)))
              AS BIGINT) AS q2
  FROM {out}_agg
)"""


def _als_oracle(iterations: int = 2) -> str:
    sql = """WITH ratings AS MATERIALIZED (
  SELECT o_custkey AS u_id, p_brand AS i_id,
         CAST(SUM(l_quantity) AS BIGINT) AS rating
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
),
q0 AS MATERIALIZED (
  SELECT i_id AS k, CAST(1000000 AS BIGINT) AS q1,
         CAST(100000 + CAST(concat('0x', substr(md5(CAST(i_id AS VARCHAR)),
                                                 18, 15)) AS BIGINT) % 500000
              AS BIGINT) AS q2
  FROM (SELECT DISTINCT i_id FROM ratings)
)"""
    prev = "q0"
    for i in range(iterations):
        sql += ",\n" + _als_solve_sql(prev, "u_id", "i_id", f"p{i + 1}")
        sql += ",\n" + _als_solve_sql(f"p{i + 1}", "i_id", "u_id", f"q{i + 1}")
        prev = f"q{i + 1}"
    return sql + f"\nSELECT k AS brand, q1, q2 FROM {prev} ORDER BY brand"


ORACLE_ALS_FACTORS = _als_oracle(2)


EXTRA_QUERIES.update(
    {
        "als_factors": (
            q_als_factors,
            ORACLE_ALS_FACTORS,
            "ext:rank-2 ALS recommender (closed-form solves, exact oracle)",
        ),
    }
)


# --------------------------------------------------------------------------
# Ranking-quality metrics: NDCG@k / MRR / MAP (evaluation.ranking_metrics)
# --------------------------------------------------------------------------


def q_ndcg_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query NDCG@10 / MRR / MAP@10 of exact cosine retrieval
    against the embeddings' class labels (rel = neighbor shares the
    query's label) — the standard graded-retrieval triple next to
    ann_recall_at_k, run entirely in-engine (evaluation.py
    ranking_metrics). DCG position weights are a shared Python-
    computed integer literal table, so both engines do exact BIGINT
    gain sums; see the library docstring for the 100 TB cost split
    (fixed query sample, metric linear in |queries|·k)."""
    from yelp_etl_spark.functions import similarity as S
    from yelp_etl_spark.functions.evaluation import ranking_metrics

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    labels = emb.select("vec_id", "label")
    ranked = (
        S.brute_force_topk(emb, queries, k=10)
        .join(
            labels.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("q_label"),
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rank",
            (F.col("q_label") == F.col("n_label")).cast("long").alias("rel"),
        )
    )
    label_totals = emb.groupBy("label").agg(F.count("*").alias("n_label_total"))
    rel_counts = (
        queries.select("vec_id", "label")
        .join(F.broadcast(label_totals), "label")
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("n_label_total") - 1).cast("long").alias("n_rel"),
        )
    )
    return ranking_metrics(ranked, rel_counts, k=10)


def _oracle_ndcg(k: int = 10) -> str:
    from yelp_etl_spark.functions.evaluation import dcg_weight_micro
    from yelp_etl_spark.functions.similarity import cosine_sim_sql

    w = dcg_weight_micro(k)
    cum = []
    tot = 0
    for x in w:
        tot += x
        cum.append(tot)
    w_lit = "[" + ", ".join(str(x) for x in w) + "]"
    cum_lit = "[" + ", ".join(str(x) for x in cum) + "]"
    cos = cosine_sim_sql("q", "c")
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
),
brute AS MATERIALIZED (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos} DESC, c.vec_id ASC) AS rank
    FROM v q JOIN v c ON q.vec_id <> c.vec_id
    WHERE q.vec_id % 101 = 0
  ) WHERE rank <= {k}
),
cumr AS MATERIALIZED (
  SELECT b.query_id, b.rank,
         CASE WHEN qv.label = cv.label THEN 1 ELSE 0 END AS rel,
         SUM(CASE WHEN qv.label = cv.label THEN 1 ELSE 0 END)
           OVER (PARTITION BY b.query_id ORDER BY b.rank) AS cum_rel
  FROM brute b
  JOIN v qv ON b.query_id = qv.vec_id
  JOIN v cv ON b.neighbor_id = cv.vec_id
),
perq AS MATERIALIZED (
  SELECT query_id,
         CAST(SUM(rel * list_extract({w_lit}, rank)) AS BIGINT) AS dcg_micro,
         MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         CAST(SUM(CASE WHEN rel = 1
                       THEN CAST(ROUND(CAST(cum_rel AS DOUBLE) * 1000000
                                       / rank) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS sum_p_micro
  FROM cumr GROUP BY 1
),
nrel AS MATERIALIZED (
  SELECT q.vec_id AS query_id, CAST(t.n - 1 AS BIGINT) AS n_rel
  FROM v q
  JOIN (SELECT label, COUNT(*) AS n FROM v GROUP BY 1) t ON q.label = t.label
  WHERE q.vec_id % 101 = 0
)
SELECT n.query_id, n.n_rel,
       CASE WHEN LEAST(n.n_rel, {k}) > 0
            THEN ROUND(COALESCE(p.dcg_micro, 0)
                       / list_extract({cum_lit},
                                      CAST(LEAST(n.n_rel, {k}) AS INTEGER)), 6)
            ELSE 0.0 END AS ndcg_at_{k},
       COALESCE(ROUND(CAST(1.0 AS DOUBLE) / p.first_rel, 6), 0.0) AS mrr,
       CASE WHEN LEAST(n.n_rel, {k}) > 0
            THEN ROUND(COALESCE(p.sum_p_micro, 0)
                       / (LEAST(n.n_rel, {k}) * 1000000), 6)
            ELSE 0.0 END AS map_at_{k}
FROM nrel n LEFT JOIN perq p USING (query_id)
ORDER BY n.query_id
"""


ORACLE_NDCG_MRR = _oracle_ndcg(10)


EXTRA_QUERIES.update(
    {
        "ndcg_mrr_eval": (
            q_ndcg_mrr_eval,
            ORACLE_NDCG_MRR,
            "ext:ranking metrics NDCG@10/MRR/MAP (shared weight literals)",
        ),
    }
)


# --------------------------------------------------------------------------
# Gradient-boosted regression stumps (functions/classify.py boosted_stumps)
# --------------------------------------------------------------------------


def q_gbt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two boosting rounds of depth-1 regression stumps (squared loss)
    predicting the order discount (centi-quantized) from quantity,
    then the partkey bucket — classify.boosted_stumps. Every output
    cell is exact BIGINT (floor-quantized leaves, partials-derived
    SSE); per round the data is scanned once into a bounded
    per-feature-value model table. The candidate grids are literal on
    both sides."""
    from yelp_etl_spark.functions.classify import boosted_stumps

    lineitem = _t(spark, sf_dir, "lineitem")
    base = lineitem.select(
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_partkey") % 16).cast("long").alias("pk16"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("y_centi"),
    )
    return boosted_stumps(
        base,
        "y_centi",
        [
            ("qty", [5, 10, 15, 20, 25, 30, 35, 40, 45]),
            ("pk16", [2, 4, 6, 8, 10, 12, 14]),
        ],
    )


def _stump_round_sql(
    partials_src: str, feat: str, thresholds: list[int], idx: int
) -> str:
    grid = ", ".join(str(t) for t in thresholds)
    return f"""p{idx} AS MATERIALIZED (
  SELECT {feat} AS f, COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS s,
         CAST(SUM(r * r) AS BIGINT) AS ss
  FROM {partials_src} GROUP BY 1
),
c{idx} AS MATERIALIZED (
  SELECT CAST(t AS BIGINT) AS t,
         CAST(SUM(CASE WHEN f <= t THEN n ELSE 0 END) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN f <= t THEN s ELSE 0 END) AS BIGINT) AS sl,
         CAST(SUM(CASE WHEN f <= t THEN ss ELSE 0 END) AS BIGINT) AS ssl,
         CAST(SUM(CASE WHEN f > t THEN n ELSE 0 END) AS BIGINT) AS nh,
         CAST(SUM(CASE WHEN f > t THEN s ELSE 0 END) AS BIGINT) AS sh,
         CAST(SUM(CASE WHEN f > t THEN ss ELSE 0 END) AS BIGINT) AS ssh
  FROM p{idx}, (SELECT unnest([{grid}]) AS t) g
  GROUP BY 1
),
b{idx} AS MATERIALIZED (
  SELECT t, nl, nh,
         (sl // nl) - (CASE WHEN sl % nl <> 0 AND sl < 0
                       THEN 1 ELSE 0 END) AS leaf_lo,
         (sh // nh) - (CASE WHEN sh % nh <> 0 AND sh < 0
                       THEN 1 ELSE 0 END) AS leaf_hi,
         sl, ssl, sh, ssh
  FROM (SELECT *, ROW_NUMBER() OVER (
          ORDER BY CAST(sl AS DOUBLE) * sl / nl
                 + CAST(sh AS DOUBLE) * sh / nh DESC, t ASC) AS rn
        FROM c{idx} WHERE nl > 0 AND nh > 0)
  WHERE rn = 1
)"""


def _stump_out_sql(idx: int) -> str:
    return f"""SELECT CAST({idx} AS BIGINT) AS round, t AS threshold,
       nl AS n_lo, nh AS n_hi, leaf_lo, leaf_hi,
       CAST((ssl - 2 * leaf_lo * sl + nl * leaf_lo * leaf_lo)
          + (ssh - 2 * leaf_hi * sh + nh * leaf_hi * leaf_hi)
            AS BIGINT) AS train_sse
FROM b{idx}"""


ORACLE_GBT_STUMPS = (
    """WITH base AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(l_partkey % 16 AS BIGINT) AS pk16,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS r
  FROM lineitem
),
"""
    + _stump_round_sql("base", "qty", [5, 10, 15, 20, 25, 30, 35, 40, 45], 1)
    + """,
res1 AS MATERIALIZED (
  SELECT pk16,
         r - (CASE WHEN qty <= b.t THEN b.leaf_lo ELSE b.leaf_hi END) AS r
  FROM base, b1 b
),
"""
    + _stump_round_sql("res1", "pk16", [2, 4, 6, 8, 10, 12, 14], 2)
    + "\n"
    + _stump_out_sql(1)
    + "\nUNION ALL\n"
    + _stump_out_sql(2)
    + "\nORDER BY round"
)


EXTRA_QUERIES.update(
    {
        "gbt_stumps": (
            q_gbt_stumps,
            ORACLE_GBT_STUMPS,
            "ext:boosted regression stumps (2 rounds, exact integer leaves/SSE)",
        ),
    }
)


# --------------------------------------------------------------------------
# Categorical feature encoders (functions/classify.py woe/loo)
# --------------------------------------------------------------------------


def q_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding of order priority against the
    'fulfilled' label (classify.woe_encode): per-category micro-nat
    WoE + information-value contribution, Laplace-smoothed. One
    partial-aggregated scan to |categories| cells + a broadcast
    totals join — the encoder a 100 TB feature pipeline can afford."""
    from yelp_etl_spark.functions.classify import woe_encode

    orders = _t(spark, sf_dir, "orders")
    return woe_encode(
        orders.select(
            "o_orderpriority",
            (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        ),
        "o_orderpriority",
        "y",
    )


ORACLE_WOE_ENCODING = """
WITH c AS MATERIALIZED (
  SELECT o_orderpriority AS category, COUNT(*) AS n,
         COUNT(*) FILTER (o_orderstatus = 'F') AS n_pos
  FROM orders GROUP BY 1
),
t AS (SELECT SUM(n_pos) AS p_tot, SUM(n - n_pos) AS n_tot FROM c)
SELECT category, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(ROUND(LN(((n_pos + CAST(0.5 AS DOUBLE)) * (n_tot + CAST(0.5 AS DOUBLE)))
                     / (((n - n_pos) + CAST(0.5 AS DOUBLE)) * (p_tot + CAST(0.5 AS DOUBLE))))
                  * 1000000) AS BIGINT) AS woe_micro,
       CAST(ROUND((CAST(n_pos AS DOUBLE) / p_tot
                   - CAST(n - n_pos AS DOUBLE) / n_tot)
                  * CAST(ROUND(LN(((n_pos + CAST(0.5 AS DOUBLE)) * (n_tot + CAST(0.5 AS DOUBLE)))
                                  / (((n - n_pos) + CAST(0.5 AS DOUBLE)) * (p_tot + CAST(0.5 AS DOUBLE))))
                               * 1000000) AS BIGINT))
            AS BIGINT) AS iv_micro
FROM c, t ORDER BY category
"""


def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment against a
    high-balance label (classify.loo_target_encode): every row carries
    its category's label mean excluding itself, FLOOR-ppm. The query
    attaches the per-row encoding through the library function, then
    proves its per-(category, label) constancy with min = max in the
    aggregate — LOO encodings take exactly two values per category."""
    from yelp_etl_spark.functions.classify import loo_target_encode

    customer = _t(spark, sf_dir, "customer")
    base = customer.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") > 4500).cast("long").alias("y"),
    )
    enc = loo_target_encode(base, "c_mktsegment", "y")
    return (
        enc.groupBy(F.col("c_mktsegment").alias("category"), "y")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("loo_enc_ppm").alias("enc_min"),
            F.max("loo_enc_ppm").alias("enc_max"),
        )
        .orderBy("category", "y")
    )


ORACLE_LOO_TARGET_ENCODING = """
WITH c AS MATERIALIZED (
  SELECT c_mktsegment AS category,
         CASE WHEN c_acctbal > 4500 THEN 1 ELSE 0 END AS y
  FROM customer
),
s AS MATERIALIZED (
  SELECT category, COUNT(*) AS n, SUM(y) AS sy FROM c GROUP BY 1
),
g AS (SELECT CAST(FLOOR(1000000 * SUM(sy) / SUM(n)) AS BIGINT) AS prior
      FROM s)
SELECT category, CAST(v.y AS BIGINT) AS y,
       CAST(CASE WHEN v.y = 1 THEN sy ELSE n - sy END AS BIGINT) AS n_rows,
       CAST(CASE WHEN n > 1
                 THEN FLOOR(1000000 * (sy - v.y) / (n - 1))
                 ELSE prior END AS BIGINT) AS enc_min,
       CAST(CASE WHEN n > 1
                 THEN FLOOR(1000000 * (sy - v.y) / (n - 1))
                 ELSE prior END AS BIGINT) AS enc_max
FROM s, (SELECT unnest([0, 1]) AS y) v, g
WHERE (CASE WHEN v.y = 1 THEN sy ELSE n - sy END) > 0
ORDER BY category, y
"""


EXTRA_QUERIES.update(
    {
        "woe_encoding": (
            q_woe_encoding,
            ORACLE_WOE_ENCODING,
            "ext:weight-of-evidence encoding (micro-nat WoE + IV)",
        ),
        "loo_target_encoding": (
            q_loo_target_encoding,
            ORACLE_LOO_TARGET_ENCODING,
            "ext:leave-one-out target encoding (floor-ppm, leak-free)",
        ),
    }
)


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record-linkage scoring
# --------------------------------------------------------------------------


# Sorted-neighborhood window width w: each record pairs with at most w
# successors in its block's k-order, so candidates are Σ_b |block|·w —
# linear in table size even with a fixed-cardinality blocking key.
_FS_NEIGHBORHOOD = 8


def q_record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage à la Fellegi-Sunter (1969): score
    brand-blocked part pairs by Σ_f ln(m_f/u_f) for agreeing fields
    and Σ_f ln((1−m_f)/(1−u_f)) for disagreeing ones — the classical
    entity-resolution weight model under every modern dedupe/Splink
    pipeline. u-probabilities (chance agreement) are ESTIMATED from
    the data as Σ_v cnt_v²/N² per field; m is the standard 0.9 prior.
    Weights quantize to micro-nats before the per-pair sum (exact
    BIGINT — the _qlog discipline), pairs come from hash blocking
    (never a cross join), and the output is the weight histogram in
    whole nats (truncated division — identical on both engines).

    Scale: naive blocking alone is Σ_b |block_b|², which grows
    QUADRATICALLY when the blocking key has fixed cardinality (this
    one does: |brands|×10 blocks forever). The query therefore
    enforces the sorted-neighborhood cap (Hernández & Stolfo 1995,
    the same bound Splink exposes as a blocking-rule budget): rank
    records within each block by the stable sort key ``k`` and pair
    only neighbors whose ranks differ by ≤ _FS_NEIGHBORHOOD. Candidate
    count is then Σ_b |block_b|·w = O(N·w) — LINEAR in data size no
    matter how the block-size distribution degenerates. The rank
    window partitions by block (hash-parallel across blocks; a block
    must fit one partition's sort — at extreme per-block sizes you
    would range-partition the in-block sort, the standard
    sorted-neighborhood sharding). The weight table stays a broadcast
    1-row frame."""
    from yelp_etl_spark.functions.checkpoint import truncate_lineage

    part = _t(spark, sf_dir, "part")
    # recs feeds three field-weight aggregations AND both sides of the
    # blocked self-join: materialize once (the repo's ≥2-consumer rule)
    # instead of five scans of the part projection
    recs = truncate_lineage(
        part.select(
            F.col("p_partkey").alias("k"),
            F.concat(
                F.col("p_brand"), F.lit("|"), (F.col("p_size") % 10)
            ).alias("b"),
            F.col("p_type").alias("f1"),
            F.split(F.lower(F.col("p_name")), " ").getItem(0).alias("f2"),
            F.floor(F.col("p_retailprice") / 100).alias("f3"),
        ).withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("b").orderBy("k")),
        ),
        eager=True,
    )

    def field_w(col: str, tag: str):
        cnts = recs.groupBy(col).agg(F.count("*").alias("cnt"))
        s = cnts.agg(
            F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
            F.sum("cnt").alias("n"),
        )
        nn = F.col("n") * F.col("n")
        return s.select(
            F.round(F.log(F.lit(0.9) * F.col("n") * F.col("n") / F.col("s2"))
                    * F.lit(1_000_000.0)).cast("long").alias(f"w{tag}a"),
            F.round(
                F.log(
                    F.lit(0.1) * F.col("n") * F.col("n")
                    / (nn - F.col("s2") + F.lit(0.5))
                )
                * F.lit(1_000_000.0)
            ).cast("long").alias(f"w{tag}d"),
        )

    weights = field_w("f1", "1").crossJoin(field_w("f2", "2")).crossJoin(
        field_w("f3", "3")
    )
    a = recs.alias("a")
    bb = recs.alias("b")
    # sorted-neighborhood cap: rn orders by k within block, so
    # b.rn > a.rn ⟺ b.k > a.k (k unique) and the ±w residual bounds
    # candidates to |block|·w instead of |block|²
    pairs = a.join(
        bb,
        (F.col("a.b") == F.col("b.b"))
        & (F.col("b.rn") > F.col("a.rn"))
        & (F.col("b.rn") <= F.col("a.rn") + F.lit(_FS_NEIGHBORHOOD)),
    ).crossJoin(F.broadcast(weights))
    w = (
        F.when(F.col("a.f1").eqNullSafe(F.col("b.f1")), F.col("w1a"))
        .otherwise(F.col("w1d"))
        + F.when(F.col("a.f2").eqNullSafe(F.col("b.f2")), F.col("w2a"))
        .otherwise(F.col("w2d"))
        + F.when(F.col("a.f3").eqNullSafe(F.col("b.f3")), F.col("w3a"))
        .otherwise(F.col("w3d"))
    )
    return (
        pairs.select(w.alias("weight"))
        .select(F.expr("weight div 1000000").alias("w_nat"))
        .groupBy("w_nat")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("w_nat")
    )


def _fs_field_w_sql(col: str, tag: str) -> str:
    return f"""w{tag} AS (
  SELECT CAST(ROUND(LN(CAST(0.9 AS DOUBLE) * n * n / s2) * 1000000)
              AS BIGINT) AS w{tag}a,
         CAST(ROUND(LN(CAST(0.1 AS DOUBLE) * n * n / (n * n - s2 + CAST(0.5 AS DOUBLE)))
                    * 1000000) AS BIGINT) AS w{tag}d
  FROM (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS s2,
               CAST(SUM(cnt) AS BIGINT) AS n
        FROM (SELECT COUNT(*) AS cnt FROM recs GROUP BY {col}))
)"""


ORACLE_RECORD_LINKAGE_FS = (
    f"""WITH recs AS MATERIALIZED (
  SELECT p_partkey AS k,
         p_brand || '|' || CAST(p_size % 10 AS VARCHAR) AS b, p_type AS f1,
         string_split(lower(p_name), ' ')[1] AS f2,
         CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS f3,
         ROW_NUMBER() OVER (PARTITION BY
             p_brand || '|' || CAST(p_size % 10 AS VARCHAR)
             ORDER BY p_partkey) AS rn
  FROM part
),
"""
    + ",\n".join(_fs_field_w_sql(c, t) for c, t in
                 [("f1", "1"), ("f2", "2"), ("f3", "3")])
    + f"""
SELECT w_nat, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM (
  SELECT ((CASE WHEN a.f1 IS NOT DISTINCT FROM b.f1 THEN w1a ELSE w1d END)
        + (CASE WHEN a.f2 IS NOT DISTINCT FROM b.f2 THEN w2a ELSE w2d END)
        + (CASE WHEN a.f3 IS NOT DISTINCT FROM b.f3 THEN w3a ELSE w3d END))
        // 1000000 AS w_nat
  FROM recs a
  JOIN recs b ON a.b = b.b AND b.rn > a.rn
             AND b.rn <= a.rn + {_FS_NEIGHBORHOOD}, w1, w2, w3
)
GROUP BY w_nat ORDER BY w_nat"""
)


EXTRA_QUERIES.update(
    {
        "record_linkage_fs": (
            q_record_linkage_fs,
            ORACLE_RECORD_LINKAGE_FS,
            "ext:Fellegi-Sunter linkage weights (blocked pairs, micro-nats)",
        ),
    }
)


# --------------------------------------------------------------------------
# Dynamic partition pruning (Catalyst runtime filter on a Hive layout)
# --------------------------------------------------------------------------


def q_dpp_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: the fact table is
    published partitioned by order year (Hive layout), the dim side is
    a small year-attribute table filtered at runtime — Catalyst
    injects a dynamicpruning subquery so the fact scan reads ONLY the
    partitions the filtered dim selects (test_plans pins the
    `dynamicpruning` expression). This is THE optimization that makes
    star joins affordable at 100 TB: the fact side never lists the
    pruned years. Oracle replays the join logically over raw orders."""
    from yelp_etl_spark.plans.catalog import _scratch_dir

    orders = _t(spark, sf_dir, "orders")
    scratch = _scratch_dir(sf_dir, "dpp")
    fact = orders.withColumn("oy", F.year("o_orderdate"))
    fact.write.partitionBy("oy").parquet(scratch)
    fact_r = spark.read.parquet(scratch)
    dim = (
        orders.select(F.year("o_orderdate").alias("oy"))
        .distinct()
        .withColumn("era", F.when(F.col("oy") >= 1999, "late").otherwise("early"))
    )
    return (
        fact_r.join(F.broadcast(dim.filter(F.col("era") == "late")), "oy")
        .groupBy("oy")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("oy")
    )


ORACLE_DPP_PRUNE = """
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS oy,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE YEAR(o_orderdate) >= 1999
GROUP BY 1 ORDER BY 1
"""


EXTRA_QUERIES.update(
    {
        "dpp_prune_join": (
            q_dpp_prune_join,
            ORACLE_DPP_PRUNE,
            "ext:dynamic partition pruning (runtime dim filter prunes fact scan)",
        ),
    }
)


# --------------------------------------------------------------------------
# Cogrouped-pandas as-of attribution (functions/udfs.py)
# --------------------------------------------------------------------------


def q_cogroup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→view attribution through the cogrouped-pandas API
    (udfs.cogrouped_asof_attribution): per user, both the view stream
    and the purchase stream arrive in ONE Python call and pandas
    merge_asof answers 'was there a view within 1 day before each
    purchase?'. The oracle replays the same bounds as an EXISTS
    subquery. This is the groupBy().cogroup().applyInPandas surface —
    the only Pandas API tier the catalog didn't already exercise."""
    from yelp_etl_spark.functions.udfs import cogrouped_asof_attribution

    # every 4th user: the cogroup API costs one Python call per key,
    # so the catalog query bounds the key count (the full-population
    # run is the same plan, linearly more keys)
    events = _t(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 0)
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts"
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return cogrouped_asof_attribution(
        views, buys, "user_id", "ts", tolerance_days=1
    ).orderBy("key")


ORACLE_COGROUP_ATTRIBUTION = """
WITH buys AS MATERIALIZED (
  SELECT user_id, ts FROM events
  WHERE event_type = 'purchase' AND user_id % 4 = 0
),
views AS MATERIALIZED (
  SELECT user_id, ts FROM events
  WHERE event_type = 'view' AND user_id % 4 = 0
)
SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_right,
       CAST(COUNT(*) FILTER (
         EXISTS (SELECT 1 FROM views v
                 WHERE v.user_id = b.user_id
                   AND v.ts <= b.ts
                   AND v.ts >= b.ts - INTERVAL 1 DAY)) AS BIGINT)
         AS n_attributed
FROM buys b
GROUP BY user_id ORDER BY key
"""


EXTRA_QUERIES.update(
    {
        "cogroup_attribution": (
            q_cogroup_attribution,
            ORACLE_COGROUP_ATTRIBUTION,
            "ext:cogrouped-pandas as-of attribution (merge_asof per key)",
        ),
    }
)


# --------------------------------------------------------------------------
# Apriori level-3 itemsets and bitemporal as-of
# --------------------------------------------------------------------------


def q_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori's defining step beyond pairwise co-purchase: 3-itemset
    mining with LEVEL-WISE CANDIDATE PRUNING — candidate (a,b,c) is
    generated from frequent pairs (a,b) ⋈ (a,c) and kept only when
    (b,c) is ALSO frequent (the downward-closure property), so the
    basket triple-join runs against a broadcast candidate list instead
    of |brands|³ cells. Support thresholds are a FLOOR-fraction of the
    basket count (scale-relative, both engines floor the same IEEE
    double). Top-20 triples, fully tie-broken."""
    baskets, n_orders = _brand_baskets(spark, sf_dir)
    minsup = int(n_orders * 3 // 1000)  # 0.3% of baskets
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("x"), F.col("b.p_brand").alias("y")
        )
        .agg(F.count("*").alias("sup2"))
        .filter(F.col("sup2") >= minsup)
    )
    from yelp_etl_spark.functions.checkpoint import truncate_lineage

    # l2 feeds THREE branches of the candidate build (p, q, and the
    # downward-closure membership check): materialize the ≤|brands|²
    # frame once
    l2 = truncate_lineage(pairs.select("x", "y"), eager=True)
    cand = (
        l2.alias("p")
        .join(
            l2.alias("q"),
            (F.col("p.x") == F.col("q.x")) & (F.col("p.y") < F.col("q.y")),
        )
        .select(
            F.col("p.x").alias("i1"),
            F.col("p.y").alias("i2"),
            F.col("q.y").alias("i3"),
        )
        # downward closure: the third sub-pair (i2, i3) must be frequent
        .join(
            l2.select(F.col("x").alias("i2"), F.col("y").alias("i3")),
            ["i2", "i3"],
            "left_semi",
        )
    )
    c = baskets.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.p_brand") < F.col("c.p_brand")),
        )
        .select(
            F.col("a.p_brand").alias("i1"),
            F.col("b.p_brand").alias("i2"),
            F.col("c.p_brand").alias("i3"),
        )
        .join(F.broadcast(cand), ["i1", "i2", "i3"], "left_semi")
        .groupBy("i1", "i2", "i3")
        .agg(F.count("*").alias("sup3"))
        .filter(F.col("sup3") >= minsup)
    )
    return (
        triples.select(
            "i1",
            "i2",
            "i3",
            F.col("sup3").cast("long").alias("sup3"),
            F.floor(F.lit(1_000_000) * F.col("sup3") / F.lit(n_orders))
            .cast("long")
            .alias("support_ppm"),
        )
        .orderBy(F.desc("sup3"), "i1", "i2", "i3")
        .limit(20)
    )


ORACLE_APRIORI_TRIPLES = """
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, p_brand AS i
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM baskets),
ms AS (SELECT CAST(n_orders * 3 // 1000 AS BIGINT) AS minsup, n_orders
       FROM n),
pairs AS MATERIALIZED (
  SELECT a.i AS x, b.i AS y, COUNT(*) AS sup2
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.i < b.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= (SELECT minsup FROM ms)
),
cand AS MATERIALIZED (
  SELECT p.x AS i1, p.y AS i2, q.y AS i3
  FROM pairs p
  JOIN pairs q ON p.x = q.x AND p.y < q.y
  JOIN pairs r ON r.x = p.y AND r.y = q.y
),
triples AS MATERIALIZED (
  SELECT a.i AS i1, b.i AS i2, c.i AS i3, CAST(COUNT(*) AS BIGINT) AS sup3
  FROM baskets a
  JOIN baskets b ON a.o = b.o AND a.i < b.i
  JOIN baskets c ON a.o = c.o AND b.i < c.i
  JOIN cand ON cand.i1 = a.i AND cand.i2 = b.i AND cand.i3 = c.i
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= (SELECT minsup FROM ms)
)
SELECT i1, i2, i3, sup3,
       CAST(FLOOR(1000000 * sup3 / (SELECT n_orders FROM ms)) AS BIGINT)
         AS support_ppm
FROM triples
ORDER BY sup3 DESC, i1, i2, i3 LIMIT 20
"""


_BITEMPORAL_CUT = "1998-01-01"
_BITEMPORAL_ASOF = "1999-06-01"


def q_bitemporal_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of: VALID time from the SCD2 status history,
    SYSTEM time from the snapshot layer — 'what did the system as of
    snapshot S believe each customer's status was on date D?'.
    Snapshot 1 is the table as loaded through 1997 (system time);
    snapshot 2 is the full load; both are queried for the status
    distribution valid on 1999-06-01 — a date AFTER the cut, so the
    facts snapshot 2 adds genuinely change the answer about that
    valid-time instant (the as-of must postdate the system cut or the
    two sides are provably identical and the time-travel axis goes
    untested). Late-arriving facts correcting the past is the exact
    case bitemporal modeling exists to expose. Composes
    two oracle-checked layers (scd2_history + snapshot time travel);
    the per-customer windows are bounded by order counts."""
    from yelp_etl_spark.operators.scd import scd2_history
    from yelp_etl_spark.plans.catalog import _scratch_dir
    from yelp_etl_spark.sources.snapshots import snapshot_read, snapshot_write

    orders = _t(spark, sf_dir, "orders")
    table = _scratch_dir(sf_dir, "bitemp")
    s1 = snapshot_write(
        orders.filter(F.col("o_orderdate") < F.lit(_BITEMPORAL_CUT)),
        table,
        mode="replace",
    )
    s2 = snapshot_write(orders, table, mode="replace")

    def as_of(sid: int, out: str) -> DataFrame:
        hist = scd2_history(
            snapshot_read(spark, table, snapshot_id=sid),
            "o_custkey",
            "o_orderdate",
            "o_orderstatus",
            tiebreak="o_orderkey",
        )
        d = F.lit(_BITEMPORAL_ASOF).cast("timestamp")
        return (
            hist.filter(
                (F.col("valid_from") <= d)
                & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").cast("long").alias(out))
        )

    return (
        as_of(s1, "n_sys1")
        .join(as_of(s2, "n_sys2"), "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            F.coalesce("n_sys1", F.lit(0)).cast("long").alias("n_sys1"),
            F.coalesce("n_sys2", F.lit(0)).cast("long").alias("n_sys2"),
        )
        .orderBy("o_orderstatus")
    )


def _bitemporal_side_sql(where: str, out: str) -> str:
    return f"""
  SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS {out} FROM (
    SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to
    FROM (
      SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev
      FROM orders{where}
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    WHERE prev IS NULL OR o_orderstatus <> prev
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
  )
  WHERE valid_from <= TIMESTAMP '{_BITEMPORAL_ASOF}'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_BITEMPORAL_ASOF}')
  GROUP BY o_orderstatus"""


ORACLE_BITEMPORAL = f"""
WITH sys1 AS MATERIALIZED ({_bitemporal_side_sql(
    " WHERE o_orderdate < TIMESTAMP '" + _BITEMPORAL_CUT + "'", "n_sys1")}
),
sys2 AS MATERIALIZED ({_bitemporal_side_sql("", "n_sys2")}
)
SELECT COALESCE(sys1.o_orderstatus, sys2.o_orderstatus) AS o_orderstatus,
       CAST(COALESCE(n_sys1, 0) AS BIGINT) AS n_sys1,
       CAST(COALESCE(n_sys2, 0) AS BIGINT) AS n_sys2
FROM sys1 FULL OUTER JOIN sys2 USING (o_orderstatus)
ORDER BY o_orderstatus
"""


EXTRA_QUERIES.update(
    {
        "apriori_triples": (
            q_apriori_triples,
            ORACLE_APRIORI_TRIPLES,
            "ext:Apriori 3-itemsets (downward-closure candidate pruning)",
        ),
        "bitemporal_as_of": (
            q_bitemporal_as_of,
            ORACLE_BITEMPORAL,
            "ext:bitemporal as-of (valid time x system time)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round 8: calibration / temporal forecasting / spatial containment /
# link prediction / sequence mining / source-matrix completion / split
# tooling / sketch hardening / pipeline parity
# --------------------------------------------------------------------------


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of a monotone score→probability map
    (functions/evaluation.isotonic_fit): orders bin by price-derived
    score; label = high order priority. The fit uses the minimax
    closed form max_{j<=i} min_{k>=i} mean(j..k) over the B<=32-bin
    table — two windows over the B^2 range means, everything in exact
    micro-unit integers — instead of a sequential driver-side PAVA
    sweep, so the only full-data pass is the one map-side-combinable
    groupBy that builds the bins. 100 TB: B stays ~32 no matter the
    row count; the minimax tail is constant cost. Output iso_q is
    nondecreasing by construction (the isotonic property the oracle
    re-derives independently)."""
    from yelp_etl_spark.functions.evaluation import isotonic_fit

    orders = _t(spark, sf_dir, "orders")
    bins = (
        orders.select(
            # integer div, never float /: the floor would go inexact at
            # the bucket boundary and shift rows across engines
            F.expr(
                "least(CAST(31 AS BIGINT), "
                "CAST(ROUND(o_totalprice * 100) AS BIGINT) div 2000000)"
            ).alias("bucket"),
            (F.col("o_orderpriority") < "3").cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(F.sum("y").alias("pos"), F.count("*").alias("n"))
    )
    return isotonic_fit(bins)


ORACLE_ISOTONIC_CALIBRATION = """
WITH bins AS MATERIALIZED (
  SELECT LEAST(31, CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2000000)
           AS bucket,
         CAST(SUM(CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
pref AS MATERIALIZED (
  SELECT bucket, pos, n,
         CAST(SUM(pos) OVER w - pos AS BIGINT) AS pos_before,
         CAST(SUM(n) OVER w - n AS BIGINT) AS n_before,
         CAST(SUM(pos) OVER w AS BIGINT) AS pos_upto,
         CAST(SUM(n) OVER w AS BIGINT) AS n_upto
  FROM bins
  WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
),
pairs AS MATERIALIZED (
  SELECT j.bucket AS jb, k.bucket AS kb,
         CAST((CAST(1000000 AS HUGEINT) * (k.pos_upto - j.pos_before))
              // (k.n_upto - j.n_before) AS BIGINT) AS mean_q
  FROM pref j JOIN pref k ON j.bucket <= k.bucket
),
m AS MATERIALIZED (
  SELECT jb, kb AS i,
         CAST(MIN(mean_q) OVER (PARTITION BY jb ORDER BY kb DESC
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m
  FROM pairs
),
iso AS (
  SELECT i AS bucket, m AS iso_q FROM (
    SELECT jb, i,
           CAST(MAX(m) OVER (PARTITION BY i ORDER BY jb
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m
    FROM m
  ) WHERE jb = i
)
SELECT p.bucket, p.n, p.pos,
       CAST((CAST(1000000 AS HUGEINT) * p.pos) // p.n AS BIGINT) AS rate_q,
       iso.iso_q
FROM pref p JOIN iso USING (bucket)
ORDER BY p.bucket
"""


def q_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level + trend) over the
    1995 weekly-revenue series — the trend-aware sibling of
    ewma_smooth. The recurrence is exact-integer: with alpha=0.2,
    beta=0.1 the state updates are l' = (2x + 8(l+b)) div 10,
    b' = ((l'-l) + 9b) div 10 in BIGINT cents with floor division
    (divisor is +10, so Python //, Spark's portable-floor convention,
    and DuckDB // all agree even on negative trends), so both engines
    replay the ~52-step fold bit-identically. Output: final
    level/trend plus a 4-week-ahead linear forecast.

    Execution shape: the only full-data pass is the map-side-
    combinable groupBy to the <=53-row week series; the inherently
    sequential fold then runs on that calendar-bounded model frame via
    the repo's bounded-model-collect pattern (attribution.py's value
    iteration) — a 53-iteration recursive CTE would cost one Spark job
    PER STEP (~300 ms each, measured), pure scheduler overhead for a
    loop whose input can never exceed the calendar. The DuckDB oracle
    runs the identical recurrence as a native WITH RECURSIVE, so the
    fold semantics are pinned by pure SQL."""
    weeks = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(
            F.to_date(F.date_trunc("week", F.col("o_orderdate"))).alias("d")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
        .orderBy("d")
    )
    series = [int(r.x) for r in weeks.collect()]  # calendar-bounded <=53
    l, b = series[0], 0
    for x in series[1:]:
        l_new = (2 * x + 8 * (l + b)) // 10
        b = ((l_new - l) + 9 * b) // 10
        l = l_new
    return spark.createDataFrame(
        [(len(series), l, b, l + 4 * b)],
        "n_weeks long, level_cents long, trend_cents long, "
        "forecast_4w_cents long",
    )


ORACLE_HOLT_LINEAR_TREND = """
WITH RECURSIVE holt_days AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i, d, x FROM (
    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
    GROUP BY 1
  )
),
s AS (
  SELECT i, x AS l, CAST(0 AS BIGINT) AS b FROM holt_days WHERE i = 1
  UNION ALL
  SELECT d.i,
         (2 * d.x + 8 * (s.l + s.b)) // 10
           - (CASE WHEN (2 * d.x + 8 * (s.l + s.b)) % 10 != 0
                   AND (2 * d.x + 8 * (s.l + s.b)) < 0 THEN 1 ELSE 0 END),
         (((2 * d.x + 8 * (s.l + s.b)) // 10
           - (CASE WHEN (2 * d.x + 8 * (s.l + s.b)) % 10 != 0
                   AND (2 * d.x + 8 * (s.l + s.b)) < 0 THEN 1 ELSE 0 END)
           - s.l) + 9 * s.b) // 10
           - (CASE WHEN (((2 * d.x + 8 * (s.l + s.b)) // 10
                - (CASE WHEN (2 * d.x + 8 * (s.l + s.b)) % 10 != 0
                        AND (2 * d.x + 8 * (s.l + s.b)) < 0 THEN 1 ELSE 0 END)
                - s.l) + 9 * s.b) % 10 != 0
              AND (((2 * d.x + 8 * (s.l + s.b)) // 10
                - (CASE WHEN (2 * d.x + 8 * (s.l + s.b)) % 10 != 0
                        AND (2 * d.x + 8 * (s.l + s.b)) < 0 THEN 1 ELSE 0 END)
                - s.l) + 9 * s.b) < 0 THEN 1 ELSE 0 END)
  FROM s JOIN holt_days d ON d.i = s.i + 1
)
SELECT CAST(MAX(i) AS BIGINT) AS n_weeks,
       CAST(MAX_BY(l, i) AS BIGINT) AS level_cents,
       CAST(MAX_BY(b, i) AS BIGINT) AS trend_cents,
       CAST(MAX_BY(l, i) + 4 * MAX_BY(b, i) AS BIGINT) AS forecast_4w_cents
FROM s
"""


def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest (MASE, Hyndman & Koehler 2006, + quantized
    sMAPE) of the seasonal-naive forecaster y_hat(d) = y(d-7) on the
    last 4 ISO weeks of 1995 daily revenue, with the in-sample naive
    one-step error as the MASE scale. The evaluation the
    seasonal_decompose_dow diagnostic feeds into: is the weekly cycle
    actually predictive? Pure windows over the <=365-row day series
    (lag 7 forecast, lag 1 scale), integer-cents absolute errors,
    one final 1-row reduce; MASE/sMAPE quantize to micro-units via
    decimal cross products. Scale: one map-side-combinable groupBy to
    the day table; constant after."""
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
    w = Window.orderBy("d")
    feat = days.select(
        "d",
        "y",
        F.lag("y", 7).over(w).alias("yhat"),
        F.lag("y", 1).over(w).alias("yprev"),
    )
    cut = F.lit("1995-12-04")
    test = feat.filter((F.col("d") >= cut) & F.col("yhat").isNotNull())
    train = feat.filter((F.col("d") < cut) & F.col("yprev").isNotNull())
    t = test.agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.abs(F.col("y") - F.col("yhat"))).cast("long").alias("mae_sum"),
        F.sum(F.abs(F.col("y") - F.col("yhat")).cast("decimal(38,0)") * 2_000_000)
        .alias("smape_num_x"),
    )
    smape_den = test.select(
        (F.abs("y") + F.abs("yhat")).cast("long").alias("den")
    ).agg(F.sum("den").alias("sden"))
    tr = train.agg(
        F.count("*").cast("long").alias("n_train"),
        F.sum(F.abs(F.col("y") - F.col("yprev"))).cast("long").alias("naive_sum"),
    )
    # MASE = (mae_sum/n_test) / (naive_sum/n_train)
    #      = mae_sum * n_train / (naive_sum * n_test), micro-quantized
    return (
        t.crossJoin(tr)
        .crossJoin(smape_den)
        .select(
            "n_test",
            "n_train",
            "mae_sum",
            "naive_sum",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * mae_sum * n_train)"
                " div (CAST(naive_sum AS DECIMAL(38,0)) * n_test) AS BIGINT)"
            ).alias("mase_micro"),
            # sMAPE = mean over test of 2|y-yhat|/(|y|+|yhat|): computed
            # per-day exactly would need a per-row division; the
            # aggregate ratio-of-sums variant below is the standard
            # weighted sMAPE and stays one exact integer division
            F.expr(
                "CAST(smape_num_x div (CAST(sden AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("wsmape_micro"),
        )
    )


ORACLE_SEASONAL_NAIVE_BACKTEST = """
WITH days AS MATERIALIZED (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
feat AS MATERIALIZED (
  SELECT d, y,
         LAG(y, 7) OVER (ORDER BY d) AS yhat,
         LAG(y, 1) OVER (ORDER BY d) AS yprev
  FROM days
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(ABS(y - yhat)) AS BIGINT) AS mae_sum,
         CAST(SUM(CAST(ABS(y - yhat) AS HUGEINT) * 2000000) AS HUGEINT)
           AS smape_num_x,
         CAST(SUM(ABS(y) + ABS(yhat)) AS BIGINT) AS sden
  FROM feat WHERE d >= DATE '1995-12-04' AND yhat IS NOT NULL
),
tr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(SUM(ABS(y - yprev)) AS BIGINT) AS naive_sum
  FROM feat WHERE d < DATE '1995-12-04' AND yprev IS NOT NULL
)
SELECT n_test, n_train, mae_sum, naive_sum,
       CAST((CAST(1000000 AS HUGEINT) * mae_sum * n_train)
            // (CAST(naive_sum AS HUGEINT) * n_test) AS BIGINT) AS mase_micro,
       CAST(smape_num_x // CAST(sden AS HUGEINT) AS BIGINT) AS wsmape_micro
FROM t CROSS JOIN tr
"""


EXTRA_QUERIES.update(
    {
        "isotonic_calibration": (
            q_isotonic_calibration,
            ORACLE_ISOTONIC_CALIBRATION,
            "ext:isotonic (PAVA) calibration via exact minimax windows",
        ),
        "holt_linear_trend": (
            q_holt_linear_trend,
            ORACLE_HOLT_LINEAR_TREND,
            "ext:Holt double exponential smoothing (native recursive CTE)",
        ),
        "seasonal_naive_backtest": (
            q_seasonal_naive_backtest,
            ORACLE_SEASONAL_NAIVE_BACKTEST,
            "ext:MASE/sMAPE forecast backtest of the weekly seasonal-naive",
        ),
    }
)


def q_hamming_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-embedding ANN: sign-quantize the 64-d float vectors into
    two 32-bit words (1 bit per dimension, packed by explicit integer
    arithmetic — no float survives the encode) and rank neighbors by
    Hamming distance via bit_count(xor) — the 1-bit quantization path
    of the ANN family (cosine_topk exact float / LSH / IVF / PQ),
    storing 64× less and comparing with two popcounts. Ties break by
    neighbor id, making top-5 deterministic. Scale: the encode is one
    linear projection; the query side is the bounded 10-vector frame
    broadcast against the encoded table (the brute-force baseline
    shape), and the LSH-bucketed variant applies unchanged on the
    packed words."""
    emb = _t(spark, sf_dir, "embeddings")

    def pack(lo: int) -> F.Column:
        return F.expr(
            "aggregate(zip_with("
            f"slice(embedding, {lo + 1}, 32), sequence(0, 31), "
            "(v, i) -> IF(v > CAST(0.0 AS FLOAT),"
            " shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    packed = emb.select(
        "vec_id", pack(0).alias("w_lo"), pack(32).alias("w_hi")
    )
    q = packed.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
    )
    scored = packed.join(
        F.broadcast(q), packed["vec_id"] != q["query_id"]
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.expr("q_lo ^ w_lo"))
            + F.bit_count(F.expr("q_hi ^ w_hi"))
        )
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "neighbor_id", "hamming",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


ORACLE_HAMMING_BINARY_TOPK = """
WITH packed AS MATERIALIZED (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding[1:32],
              (v, i) -> CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
                         ELSE 0 END)) AS BIGINT) AS w_lo,
         CAST(list_sum(list_transform(embedding[33:64],
              (v, i) -> CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
                         ELSE 0 END)) AS BIGINT) AS w_hi
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(CAST(q.w_lo AS BIGINT), c.w_lo))
              + bit_count(xor(CAST(q.w_hi AS BIGINT), c.w_hi))
              AS BIGINT) AS hamming
  FROM packed q JOIN packed c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, neighbor_id, hamming, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY hamming, neighbor_id) AS rank FROM scored)
WHERE rank <= 5
ORDER BY query_id, rank
"""


EXTRA_QUERIES.update(
    {
        "hamming_binary_topk": (
            q_hamming_binary_topk,
            ORACLE_HAMMING_BINARY_TOPK,
            "ext:1-bit binary-embedding ANN (sign pack to two words,"
            " popcount Hamming top-k)",
        ),
    }
)


def q_temporal_purged_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free temporal cross-validation with purge + embargo
    (the de Prado purged k-fold, public "Advances in Financial ML"
    methodology — the TIME-axis counterpart to grouped_kfold_assign's
    group-leakage guard): the event range splits into 5 contiguous
    time folds; for each validation fold, training rows within the
    1-day label horizon BEFORE the fold are purged (their labels peek
    into the fold) and rows within the 1-day embargo AFTER it are
    dropped too (serial correlation leaks backwards). All assignments
    are integer epoch arithmetic against one broadcast (min, max)
    frame — every count is exact and partitioning-independent. Cross-
    engine parity is integer-exact by construction: t truncates the
    epoch on BOTH sides (Spark unix_timestamp truncates; the oracle
    wraps epoch(ts) in FLOOR — a bare BIGINT cast would round-to-
    nearest and diverge on fractional-second timestamps), and the fold
    boundaries use integer floor-division (Spark `div` / DuckDB `//`),
    never double-multiply-then-cast. Scale: two linear passes, no
    window, no shuffle beyond the 5×counts rollup."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("t0"),
        (F.max(F.unix_timestamp("ts")) + 1).alias("t1"),
    )
    day = 86_400
    with_fold = ev.crossJoin(F.broadcast(bounds)).select(
        F.unix_timestamp("ts").alias("t"),
        "t0",
        "t1",
        F.least(
            F.lit(4).cast("long"),
            F.expr(
                "(5 * (unix_timestamp(ts) - t0)) div (t1 - t0)"
            ),
        )
        .cast("long")
        .alias("row_fold"),
    )
    folds = spark.range(5).select(F.col("id").cast("long").alias("fold"))
    labeled = with_fold.crossJoin(F.broadcast(folds)).select(
        "fold",
        "row_fold",
        "t",
        F.expr("t0 + ((t1 - t0) * fold) div 5").cast("long").alias("v_start"),
        F.expr("t0 + ((t1 - t0) * (fold + 1)) div 5")
        .cast("long")
        .alias("v_end"),
    )
    status = labeled.select(
        "fold",
        F.when(F.col("row_fold") == F.col("fold"), F.lit("val"))
        .when(
            (F.col("t") >= F.col("v_start") - day)
            & (F.col("t") < F.col("v_end") + day),
            F.lit("purged"),
        )
        .otherwise(F.lit("train"))
        .alias("status"),
    )
    return (
        status.groupBy("fold")
        .agg(
            F.sum((F.col("status") == "val").cast("long"))
            .cast("long")
            .alias("n_val"),
            F.sum((F.col("status") == "train").cast("long"))
            .cast("long")
            .alias("n_train"),
            F.sum((F.col("status") == "purged").cast("long"))
            .cast("long")
            .alias("n_purged_embargoed"),
        )
        .orderBy("fold")
    )


ORACLE_TEMPORAL_PURGED_SPLIT = """
WITH bounds AS (
  SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS t0,
         CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) + 1 AS t1
  FROM events
),
rows_f AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, t0, t1,
         LEAST(4, (5 * (CAST(FLOOR(epoch(ts)) AS BIGINT) - t0))
                    // (t1 - t0)) AS row_fold
  FROM events, bounds
),
labeled AS (
  SELECT f.fold, r.row_fold, r.t,
         r.t0 + ((r.t1 - r.t0) * f.fold) // 5 AS v_start,
         r.t0 + ((r.t1 - r.t0) * (f.fold + 1)) // 5 AS v_end
  FROM rows_f r CROSS JOIN (SELECT UNNEST(range(5)) AS fold) f
),
status AS (
  SELECT fold,
         CASE WHEN row_fold = fold THEN 'val'
              WHEN t >= v_start - 86400 AND t < v_end + 86400
                THEN 'purged'
              ELSE 'train' END AS status
  FROM labeled
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(SUM(CASE WHEN status = 'val' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_val,
       CAST(SUM(CASE WHEN status = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN status = 'purged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purged_embargoed
FROM status GROUP BY fold ORDER BY fold
"""


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient over the three
    integer line-item measures (quantity, discount%, tax%) — the
    measurement-reliability classic beside cohens_kappa (rater
    agreement) and spearman_corr (monotone association): α =
    k/(k−1)·(1 − Σσ²ᵢ/σ²_total). Every variance comes from exact
    BIGINT/decimal power sums of small integers in ONE aggregate pass;
    the n-scaling cancels in the ratio, so α is a single deterministic
    double expression quantized to micro. Scale: one
    map-side-combinable aggregate, 1-row reduce."""
    li = _t(spark, sf_dir, "lineitem")
    x1 = F.floor("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    x3 = F.round(F.col("l_tax") * 100).cast("long")
    tot = x1 + x2 + x3
    agg = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x1).cast("long").alias("s1"),
        F.sum(x1 * x1).cast("long").alias("ss1"),
        F.sum(x2).cast("long").alias("s2"),
        F.sum(x2 * x2).cast("long").alias("ss2"),
        F.sum(x3).cast("long").alias("s3"),
        F.sum(x3 * x3).cast("long").alias("ss3"),
        F.sum(tot).cast("long").alias("st"),
        F.sum(tot * tot).cast("long").alias("sst"),
    )

    def var(ss: str, s: str):
        return (
            F.col(ss).cast("double")
            - F.col(s).cast("double") * F.col(s) / F.col("n")
        )

    alpha = (F.lit(3.0) / F.lit(2.0)) * (
        F.lit(1.0)
        - (var("ss1", "s1") + var("ss2", "s2") + var("ss3", "s3"))
        / var("sst", "st")
    )
    return agg.select(
        "n",
        F.round(alpha * F.lit(1_000_000.0)).cast("long").alias(
            "alpha_micro"
        ),
    )


ORACLE_CRONBACH_ALPHA = """
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s1, CAST(SUM(q * q) AS BIGINT) AS ss1,
         CAST(SUM(d) AS BIGINT) AS s2, CAST(SUM(d * d) AS BIGINT) AS ss2,
         CAST(SUM(x) AS BIGINT) AS s3, CAST(SUM(x * x) AS BIGINT) AS ss3,
         CAST(SUM(q + d + x) AS BIGINT) AS st,
         CAST(SUM((q + d + x) * (q + d + x)) AS BIGINT) AS sst
  FROM (
    SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
           CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
           CAST(ROUND(l_tax * 100) AS BIGINT) AS x
    FROM lineitem
  )
)
SELECT n,
       CAST(ROUND(1.5 * (1.0 -
              ((ss1 - CAST(s1 AS DOUBLE) * s1 / n)
               + (ss2 - CAST(s2 AS DOUBLE) * s2 / n)
               + (ss3 - CAST(s3 AS DOUBLE) * s3 / n))
              / (sst - CAST(st AS DOUBLE) * st / n))
            * 1000000) AS BIGINT) AS alpha_micro
FROM agg
"""


EXTRA_QUERIES.update(
    {
        "temporal_purged_split": (
            q_temporal_purged_split,
            ORACLE_TEMPORAL_PURGED_SPLIT,
            "ext:purged+embargoed temporal k-fold (leakage-free time"
            " CV, exact epoch arithmetic)",
        ),
        "cronbach_alpha": (
            q_cronbach_alpha,
            ORACLE_CRONBACH_ALPHA,
            "ext:Cronbach alpha reliability (exact integer power sums,"
            " one-pass)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round-9 late additions, wave 6
# --------------------------------------------------------------------------


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution (the game-theoretic
    gold standard the markov_attribution / cogroup_attribution
    heuristics approximate): each of the 4 non-purchase channels gets
    its Shapley share of conversions, with coalition value v(S) =
    conversions reachable using only channels in S (users whose
    touched set ⊆ S). The data reduces to 16 coalition-mask counts in
    ONE keyed aggregate; v(S) is a subset-sum join over the bounded
    16×16 mask lattice; and φᵢ uses the exact factorial weights
    |S|!(n−1−|S|)!/n! kept as integers over the common denominator
    4! = 24, so 24·φᵢ is an exact BIGINT and the ppm value one final
    integer division. Scale: everything after the per-user aggregate
    runs on literal 16-row model frames."""
    ev = _t(spark, sf_dir, "events")
    chans = ["click", "error", "signup", "view"]
    mask = sum(
        (
            F.max((F.col("event_type") == c).cast("long")) * (1 << i)
            for i, c in enumerate(chans)
        ),
        F.lit(0),
    )
    users = ev.groupBy("user_id").agg(
        mask.cast("long").alias("m"),
        F.max((F.col("event_type") == "purchase").cast("long")).alias(
            "conv"
        ),
    )
    cm = users.filter(F.col("conv") == 1).groupBy("m").agg(
        F.count("*").cast("long").alias("c")
    )
    coalitions = spark.range(16).select(F.col("id").cast("long").alias("s"))
    v = (
        F.broadcast(coalitions)
        .join(cm, F.expr("(m & s) = m"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("v"))
    )
    # weight numerators over 4! = 24 for |S| = 0..3 (S excludes i)
    wnum = {0: 6, 1: 2, 2: 2, 3: 6}
    vs = v.alias("vs")
    vsi = v.alias("vsi")
    rows = []
    for i, c in enumerate(chans):
        bit = 1 << i
        contrib = (
            vs.filter(F.expr(f"(s & {bit}) = 0"))
            .join(
                vsi.select(
                    F.col("s").alias("si"), F.col("v").alias("v_with")
                ),
                F.expr(f"si = s + {bit}"),
            )
            .select(
                F.lit(c).alias("channel"),
                (
                    F.when(F.bit_count("s") == 0, wnum[0])
                    .when(F.bit_count("s") == 1, wnum[1])
                    .when(F.bit_count("s") == 2, wnum[2])
                    .otherwise(wnum[3])
                    * (F.col("v_with") - F.col("v"))
                ).alias("term"),
            )
        )
        rows.append(contrib)
    allc = rows[0]
    for r in rows[1:]:
        allc = allc.unionByName(r)
    return (
        allc.groupBy("channel")
        .agg(F.sum("term").cast("long").alias("phi_x24"))
        .select(
            "channel",
            "phi_x24",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * phi_x24)"
                " DIV 24 AS LONG)"
            ).alias("phi_micro"),
        )
        .orderBy("channel")
    )


ORACLE_SHAPLEY_ATTRIBUTION = """
WITH users AS MATERIALIZED (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              + 2 * MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              + 8 * MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS m,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
cm AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM users
  WHERE conv = 1 GROUP BY m
),
v AS (
  SELECT s.s, CAST(COALESCE(SUM(cm.c), 0) AS BIGINT) AS v
  FROM (SELECT UNNEST(range(16)) AS s) s
  LEFT JOIN cm ON (cm.m & s.s) = cm.m
  GROUP BY s.s
),
terms AS (
  SELECT ch.channel, ch.bit,
         (CASE bit_count(vs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
               WHEN 2 THEN 2 ELSE 6 END)
           * (vi.v - vs.v) AS term
  FROM (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8))
       AS ch(channel, bit)
  JOIN v vs ON (vs.s & ch.bit) = 0
  JOIN v vi ON vi.s = vs.s + ch.bit
)
SELECT channel,
       CAST(SUM(term) AS BIGINT) AS phi_x24,
       CAST((CAST(1000000 AS HUGEINT) * CAST(SUM(term) AS BIGINT)) // 24
            AS BIGINT) AS phi_micro
FROM terms GROUP BY channel ORDER BY channel
"""


EXTRA_QUERIES.update(
    {
        "shapley_attribution": (
            q_shapley_attribution,
            ORACLE_SHAPLEY_ATTRIBUTION,
            "ext:exact Shapley channel attribution (16-coalition"
            " lattice, integer factorial weights over 4!)",
        ),
    }
)


def q_conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with finite-sample
    coverage, hard-checked: fit the daily-revenue OLS trend on a
    deterministic calibration half (even day index), take the conformal
    quantile q = the ⌈(n+1)(1−α)⌉-th smallest absolute calibration
    residual (an EXACT order statistic via the distinct-value
    cumulative window — no approximate percentile), and measure
    empirical coverage of ŷ±q on the held-out half. The split-conformal
    guarantee (Vovk; Lei et al., public) says coverage ≥ 1−α in
    expectation — the query emits the exact hit counts so the oracle
    certifies both the quantile selection and the coverage arithmetic.
    All counts integer; residuals double but single-expression
    deterministic, quantized to micro before ranking. Scale: one keyed
    aggregate to the ≤365-day frame; windows over that bounded frame."""
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
    base = days.agg(F.min("d").alias("d0"))
    idx = days.crossJoin(F.broadcast(base)).select(
        F.datediff("d", "d0").cast("long").alias("t"), "y"
    )
    cal = idx.filter(F.col("t") % 2 == 0)
    test = idx.filter(F.col("t") % 2 == 1)
    sums = cal.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("y")).alias("sty"),
    )
    b = (
        (
            F.col("n").cast("double") * F.col("sty").cast("double")
            - F.col("st").cast("double") * F.col("sy")
        )
        / (
            F.col("n").cast("double") * F.col("stt")
            - F.col("st").cast("double") * F.col("st")
        )
    )
    a = (F.col("sy").cast("double") - b * F.col("st")) / F.col("n")
    model = F.broadcast(
        sums.select(b.alias("b"), a.alias("a"), F.col("n").alias("n_cal"))
    )
    resid = cal.crossJoin(model).select(
        "n_cal",
        F.round(
            F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("t"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("r_micro"),
    )
    # exact order statistic: k = ceil((n+1)*0.9) over distinct values
    cells = resid.groupBy("n_cal", "r_micro").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wcum = Window.partitionBy("n_cal").orderBy("r_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = (
        cells.select(
            "n_cal",
            "r_micro",
            F.sum("cnt").over(wcum).alias("cum"),
        )
        .filter(
            F.col("cum")
            >= F.expr("CAST((((n_cal + 1) * 9) + 9) DIV 10 AS LONG)")
        )
        .groupBy("n_cal")
        .agg(F.min("r_micro").cast("long").alias("q_micro"))
    )
    covered = (
        test.crossJoin(model)
        .crossJoin(F.broadcast(q.select("q_micro")))
        .select(
            (
                F.round(
                    F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("t"))
                    * F.lit(1_000_000.0)
                ).cast("long")
                <= F.col("q_micro")
            )
            .cast("long")
            .alias("hit"),
            "q_micro",
            "n_cal",
        )
    )
    return covered.groupBy("n_cal", "q_micro").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum("hit").cast("long").alias("n_covered"),
    ).select(
        "n_cal",
        "q_micro",
        "n_test",
        "n_covered",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_covered)"
            " DIV n_test AS LONG)"
        ).alias("coverage_ppm"),
    )


ORACLE_CONFORMAL_INTERVAL_COVERAGE = """
WITH days AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995 GROUP BY 1
),
idx AS (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM days), d) AS BIGINT)
           AS t, y
  FROM days
),
cal AS (SELECT * FROM idx WHERE t % 2 = 0),
tst AS (SELECT * FROM idx WHERE t % 2 = 1),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(t AS HUGEINT) * y) AS sty
  FROM cal
),
model AS (
  SELECT (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
         n AS n_cal, st, sy
  FROM sums
),
model2 AS (
  SELECT b, (CAST(sy AS DOUBLE) - b * st) / n_cal AS a, n_cal FROM model
),
resid AS (
  SELECT n_cal,
         CAST(ROUND(ABS(y - a - b * t) * 1000000) AS BIGINT) AS r_micro
  FROM cal, model2
),
cells AS (
  SELECT n_cal, r_micro, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM resid GROUP BY 1, 2
),
qsel AS (
  SELECT n_cal, CAST(MIN(r_micro) AS BIGINT) AS q_micro
  FROM (
    SELECT n_cal, r_micro,
           SUM(cnt) OVER (PARTITION BY n_cal ORDER BY r_micro
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM cells
  )
  WHERE cum >= (((n_cal + 1) * 9) + 9) // 10
  GROUP BY n_cal
)
SELECT q.n_cal, q.q_micro,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN CAST(ROUND(ABS(y - a - b * t) * 1000000)
                          AS BIGINT) <= q_micro
                THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST((CAST(1000000 AS HUGEINT)
             * CAST(SUM(CASE WHEN CAST(ROUND(ABS(y - a - b * t) * 1000000)
                                  AS BIGINT) <= q_micro
                      THEN 1 ELSE 0 END) AS BIGINT)) // COUNT(*)
            AS BIGINT) AS coverage_ppm
FROM tst, model2, qsel q
GROUP BY 1, 2
"""


EXTRA_QUERIES.update(
    {
        "conformal_interval_coverage": (
            q_conformal_interval_coverage,
            ORACLE_CONFORMAL_INTERVAL_COVERAGE,
            "ext:split-conformal prediction intervals (exact order-"
            "statistic quantile, finite-sample coverage checked)",
        ),
    }
)


def q_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka prefix-dimension retrieval audit (Kusupati et al.
    2022, arXiv 2205.13147 — MRL-trained embeddings let you serve the
    first d′ dimensions at d/d′ the cost): recall@5 of exact top-5
    retrieval using ONLY the first 16 of 64 dimensions against the
    full-precision top-5, per query. Both rankings are exact cosine
    top-k with the same deterministic tie-break, so overlap counts are
    integers and the oracle recomputes them directly — this is the
    operational check you run before flipping a serving tier to
    truncated vectors. Scale: the query side is the bounded 10-vector
    broadcast (the cosine_topk baseline shape) at both dimensions."""
    emb = _t(spark, sf_dir, "embeddings")

    def dot_expr(acol: str, bcol: str, dims: int) -> F.Column:
        return F.expr(
            f"aggregate(zip_with(slice({acol}, 1, {dims}),"
            f" slice({bcol}, 1, {dims}), (x, y) -> CAST(x AS DOUBLE) * y),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = emb.join(F.broadcast(q), emb["vec_id"] != q["query_id"]).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot_expr("qe", "embedding", 64)
            / F.sqrt(dot_expr("qe", "qe", 64))
            / F.sqrt(dot_expr("embedding", "embedding", 64))
        ).alias("cos_full"),
        (
            dot_expr("qe", "embedding", 16)
            / F.sqrt(dot_expr("qe", "qe", 16))
            / F.sqrt(dot_expr("embedding", "embedding", 16))
        ).alias("cos_16"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), "neighbor_id"
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("cos_16"), "neighbor_id"
    )
    ranked = pairs.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wp).alias("rk_16"),
    )
    return (
        ranked.filter(F.col("rk_full") <= 5)
        .groupBy("query_id")
        .agg(
            F.sum((F.col("rk_16") <= 5).cast("long"))
            .cast("long")
            .alias("overlap_at_5"),
        )
        .select(
            "query_id",
            "overlap_at_5",
            F.expr("CAST((1000000 * overlap_at_5) DIV 5 AS LONG)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("query_id")
    )


ORACLE_MATRYOSHKA_PREFIX_RECALL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
pairs AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.emb, c.emb)
           / sqrt(list_dot_product(q.emb, q.emb))
           / sqrt(list_dot_product(c.emb, c.emb)) AS cos_full,
         list_dot_product(q.emb[1:16], c.emb[1:16])
           / sqrt(list_dot_product(q.emb[1:16], q.emb[1:16]))
           / sqrt(list_dot_product(c.emb[1:16], c.emb[1:16])) AS cos_16
  FROM v q JOIN v c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_full DESC, neighbor_id) AS rk_full,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_16 DESC, neighbor_id) AS rk_16
  FROM pairs
)
SELECT query_id,
       CAST(SUM(CASE WHEN rk_16 <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS overlap_at_5,
       CAST((1000000 * CAST(SUM(CASE WHEN rk_16 <= 5 THEN 1 ELSE 0 END)
             AS BIGINT)) // 5 AS BIGINT) AS recall_ppm
FROM ranked WHERE rk_full <= 5
GROUP BY query_id ORDER BY query_id
"""


EXTRA_QUERIES.update(
    {
        "matryoshka_prefix_recall": (
            q_matryoshka_prefix_recall,
            ORACLE_MATRYOSHKA_PREFIX_RECALL,
            "ext:Matryoshka truncated-dimension retrieval audit"
            " (prefix-16 vs full-64 recall@5, exact rankings)",
        ),
    }
)


def q_dbscan_core_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core/border/noise classification — the density-based
    outlier/cluster triage pass (the full cluster labeling is
    connected components over the core graph, already covered by
    neardup_components; the per-point classification is the scalable
    one-pass part): neighbor counts come from the fixed-grid 3×3
    candidate equi-join at cell size = ε (the grid_radius_join
    discipline — never an all-pairs distance join), exact integer L2;
    core = ≥ minPts ε-neighbors, border = non-core with a core
    ε-neighbor, noise = rest. Coordinates are the repo's portable
    hash60 planar synth (shared with spatial_radius_join). All counts
    exact. Scale: candidates are O(n · density·9ε²); ε shrinks as
    density grows — the standard grid trade-off, documented."""
    from yelp_etl_spark.functions.sampling import hash60

    EPS, MINPTS = 60_000, 4
    eps2 = EPS * EPS

    def coord(prefix: str, key) -> F.Column:
        return hash60(F.concat(F.lit(prefix), key.cast("string"))) % _GEO_SIDE

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        coord("gx", F.col("c_custkey")).alias("x"),
        coord("gy", F.col("c_custkey")).alias("y"),
    )
    pts = cust.select(
        "pid", "x", "y",
        (F.col("x") / EPS).cast("long").alias("cx"),
        (F.col("y") / EPS).cast("long").alias("cy"),
    ).localCheckpoint(eager=True)
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    probes = pts.crossJoin(F.broadcast(offsets)).select(
        F.col("pid").alias("qid"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        (F.col("cx") + F.col("dx")).alias("ncx"),
        (F.col("cy") + F.col("dy")).alias("ncy"),
    )
    cand = probes.join(
        pts.select(
            F.col("pid").alias("nid"),
            F.col("x").alias("nx"),
            F.col("y").alias("ny"),
            F.col("cx").alias("ncx"),
            F.col("cy").alias("ncy"),
        ),
        ["ncx", "ncy"],
    ).filter(
        (F.col("qid") != F.col("nid"))
        & (
            (F.col("qx") - F.col("nx")) * (F.col("qx") - F.col("nx"))
            + (F.col("qy") - F.col("ny")) * (F.col("qy") - F.col("ny"))
            <= eps2
        )
    ).select("qid", "nid")
    cand = cand.localCheckpoint(eager=True)
    ncnt = cand.groupBy("qid").agg(F.count("*").cast("long").alias("k"))
    core = ncnt.filter(F.col("k") >= MINPTS).select(
        F.col("qid").alias("core_id")
    )
    with_core_nbr = (
        cand.join(core, cand["nid"] == core["core_id"])
        .select("qid")
        .distinct()
        .withColumn("has_core_nbr", F.lit(1))
    )
    classified = (
        pts.select("pid")
        .join(ncnt.withColumnRenamed("qid", "pid"), "pid", "left")
        .join(
            with_core_nbr.withColumnRenamed("qid", "pid"), "pid", "left"
        )
        .select(
            "pid",
            F.coalesce(F.col("k"), F.lit(0)).alias("k"),
            F.coalesce(F.col("has_core_nbr"), F.lit(0)).alias("hcn"),
        )
        .select(
            F.when(F.col("k") >= MINPTS, F.lit("core"))
            .when(F.col("hcn") == 1, F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("cls"),
            "k",
        )
    )
    return (
        classified.groupBy("cls")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.sum("k").cast("long").alias("sum_neighbors"),
        )
        .orderBy("cls")
    )


ORACLE_DBSCAN_CORE_CLASSIFICATION = f"""
WITH pts AS MATERIALIZED (
  SELECT c_custkey AS pid,
         CAST(concat('0x', substr(md5('gx' || CAST(c_custkey AS VARCHAR)),
                                  18, 15)) AS BIGINT) % {_GEO_SIDE} AS x,
         CAST(concat('0x', substr(md5('gy' || CAST(c_custkey AS VARCHAR)),
                                  18, 15)) AS BIGINT) % {_GEO_SIDE} AS y
  FROM customer
),
cells AS MATERIALIZED (
  SELECT pid, x, y, x // 60000 AS cx, y // 60000 AS cy FROM pts
),
cand AS MATERIALIZED (
  SELECT a.pid AS qid, b.pid AS nid
  FROM cells a
  JOIN (SELECT UNNEST(range(-1, 2)) AS dx) ox ON TRUE
  JOIN (SELECT UNNEST(range(-1, 2)) AS dy) oy ON TRUE
  JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
  WHERE a.pid != b.pid
    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= 3600000000
),
ncnt AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS k FROM cand GROUP BY qid),
core AS (SELECT qid FROM ncnt WHERE k >= 4),
hcn AS (
  SELECT DISTINCT c.qid FROM cand c JOIN core ON c.nid = core.qid
),
classified AS (
  SELECT CASE WHEN COALESCE(n.k, 0) >= 4 THEN 'core'
              WHEN h.qid IS NOT NULL THEN 'border'
              ELSE 'noise' END AS cls,
         COALESCE(n.k, 0) AS k
  FROM pts p
  LEFT JOIN ncnt n ON n.qid = p.pid
  LEFT JOIN hcn h ON h.qid = p.pid
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(k) AS BIGINT) AS sum_neighbors
FROM classified GROUP BY cls ORDER BY cls
"""


EXTRA_QUERIES.update(
    {
        "dbscan_core_classification": (
            q_dbscan_core_classification,
            ORACLE_DBSCAN_CORE_CLASSIFICATION,
            "ext:DBSCAN core/border/noise triage (grid 3x3 candidates,"
            " exact integer L2)",
        ),
    }
)
