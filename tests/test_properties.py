"""Property-based tests (hypothesis) for operator invariants.

Each property generates a batch of rows and runs ONE Spark job over the
batch (per-example Spark jobs would be prohibitively slow), asserting
invariants that must hold for any input — the SURVEY §5 test-strategy
upgrade over the reference's zero tests.
"""

from __future__ import annotations

from datetime import date, datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from yelp_etl_spark.functions import dedup as D
from yelp_etl_spark.functions import text as TX
from yelp_etl_spark.operators.dates import add_date_features

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=30
)


@given(batch=st.lists(words, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_fingerprint_whitespace_case_invariant(spark, batch):
    """fingerprint(text) is invariant to case and whitespace runs."""
    rows = []
    for i, ws in enumerate(batch):
        canonical = " ".join(ws)
        mangled = "  ".join(w.upper() for w in ws) + " "
        rows.append((i, canonical, mangled))
    df = spark.createDataFrame(rows, "i long, a string, b string")
    out = df.select(
        (TX.fingerprint(F.col("a")) == TX.fingerprint(F.col("b"))).alias("eq")
    ).collect()
    assert all(r.eq for r in out)


@given(batch=st.lists(words, min_size=1, max_size=8), n=st.integers(2, 4))
@settings(**SETTINGS)
def test_shingles_count_and_width(spark, batch, n):
    """Shingle arrays: ≤ max(tokens-n+1, 0) entries (distinct), each
    exactly n tokens wide."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(batch)], "i long, text string"
    )
    out = df.select(
        "i",
        F.size(TX.tokens(F.col("text"))).alias("n_tok"),
        D.shingles(F.col("text"), n).alias("sh"),
    ).collect()
    for r in out:
        expected_max = max(r.n_tok - n + 1, 0)
        assert len(r.sh) <= expected_max
        assert (expected_max == 0) == (len(r.sh) == 0)
        for gram in r.sh:
            assert len(gram.split(" ")) == n


@given(batch=st.lists(words.filter(lambda w: len(w) >= 3), min_size=2, max_size=6))
@settings(**SETTINGS)
def test_jaccard_pairs_bounds_and_self_similarity(spark, batch):
    """Every emitted pair has 0 < jaccard <= 1; duplicated docs that
    have shingles always pair at exactly 1.0."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(batch)]
    dup_src = rows[0]
    rows.append((len(rows), dup_src[1]))  # exact duplicate of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.ngram_jaccard_pairs(df, n=3, threshold=0.0).collect()
    for p in pairs:
        assert 0.0 < p.jaccard <= 1.0
    n_tokens = len(dup_src[1].split())
    if n_tokens >= 3:
        dup_pair = [
            p for p in pairs if p.id_a == 0 and p.id_b == len(rows) - 1
        ]
        assert dup_pair and dup_pair[0].jaccard == 1.0


@given(
    dates=st.lists(
        st.dates(min_value=date(1990, 1, 1), max_value=date(2035, 12, 31)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_date_features_consistent_with_python(spark, dates):
    """D1-D8 agree with Python's datetime for any date: year/month/
    quarter/ISO-week; week_start is the preceding Monday."""
    df = spark.createDataFrame(
        [(d.isoformat(),) for d in dates], "date string"
    )
    out = add_date_features(df, "date", "yyyy-MM-dd").collect()
    for d, r in zip(dates, out):
        assert r.date_year == d.year
        assert r.date_month == d.month
        assert r.date_quarter == (d.month - 1) // 3 + 1
        assert r.date_week == d.isocalendar()[1]
        ws = r.date_week_start_date
        assert ws.weekday() == 0  # Monday
        assert 0 <= (d - ws).days <= 6


@given(batch=st.lists(st.integers(0, 10**9), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_exact_dedup_partition_invariant(spark, batch):
    """exact_dedup output is identical under any repartitioning, and
    copy counts sum to the input size."""
    rows = [(i, f"doc number {v % 7}") for i, v in enumerate(batch)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, D.exact_dedup(df).collect()))
    b = sorted(map(tuple, D.exact_dedup(df.repartition(5)).collect()))
    assert a == b
    assert sum(r[2] for r in a) == len(rows)


@given(
    batch=st.lists(words, min_size=2, max_size=10),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(**SETTINGS)
def test_jaccard_prefix_join_exactness_property(spark, batch, threshold):
    """For ANY corpus and threshold, prefix filtering must reproduce
    the brute-force all-pairs shingle join verbatim (the no-false-
    negatives contract of the AllPairs/PPJoin prefix principle)."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(batch)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    brute = sorted(
        map(tuple, D.ngram_jaccard_pairs(df, n=2, threshold=threshold).collect())
    )
    pref = sorted(
        map(tuple, D.jaccard_prefix_join(df, threshold=threshold, n=2).collect())
    )
    assert pref == brute
