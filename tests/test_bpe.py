"""BPE training + exact duplicate-span tests.

The distributed BPE (functions/bpe.py) is checked against an inline
pure-Python reference implementing the canonical Sennrich et al.
algorithm (pair stats over a word-frequency dict, greedy left-to-right
non-overlapping merge) on the real sf0.001 corpus, plus pinned edge
cases for the fold semantics. duplicate_spans is checked on planted
shared substrings with exactly known span boundaries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_etl_spark.functions import bpe
from yelp_etl_spark.functions.dedup import duplicate_spans
from yelp_etl_spark.sources.readers import load_table


def _ref_bpe(word_freqs: dict[str, int], num_merges: int, min_pair_freq: int = 2):
    """Single-machine reference BPE (Sennrich et al. 2016 get_stats +
    merge loop), deterministic tiebreak (freq DESC, lhs, rhs)."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(w)
        words[key] = words.get(key, 0) + f
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (lhs, rhs), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((rank, lhs, rhs, freq))
        new_words: dict[tuple[str, ...], int] = {}
        for syms, f in words.items():
            out: list[str] = []
            pending = None
            for x in syms:
                if pending == lhs and x == rhs:
                    out.append(lhs + rhs)
                    pending = None
                else:
                    if pending is not None:
                        out.append(pending)
                    pending = x
            if pending is not None:
                out.append(pending)
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    return merges, words


@pytest.mark.heavy_rotation
def test_merge_fold_edge_cases(spark):
    rows = [
        (["x", "a", "a", "a", "a"],),
        (["a", "a", "a"],),
        (["a", "b", "a", "b"],),
        (["b", "a"],),
        (["a"],),
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    got_aa = [r[0] for r in df.select(bpe.merge_pair_expr(F.col("syms"), "a", "a")).collect()]
    assert got_aa == [["x", "aa", "aa"], ["aa", "a"], ["a", "b", "a", "b"], ["b", "a"], ["a"]]
    got_ab = [r[0] for r in df.select(bpe.merge_pair_expr(F.col("syms"), "a", "b")).collect()]
    assert got_ab == [["x", "a", "a", "a", "a"], ["a", "a", "a"], ["ab", "ab"], ["b", "a"], ["a"]]


@pytest.mark.heavy_rotation
def test_learn_bpe_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wf = {
        r["word"]: r["wfreq"]
        for r in bpe.word_frequencies(docs, "text").collect()
    }
    ref_merges, ref_words = _ref_bpe(wf, 10, min_pair_freq=2)
    got_merges, got_words = bpe.learn_bpe(docs, "text", 10, min_pair_freq=2)
    assert got_merges == ref_merges
    got_final = {
        tuple(r["syms"]): r["wfreq"]
        for r in got_words.select("syms", "wfreq").collect()
    }
    assert got_final == ref_words


@pytest.mark.heavy_rotation
def test_encode_conserves_characters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    _, words = bpe.learn_bpe(docs, "text", 6, min_pair_freq=2)
    bad = words.filter(
        F.aggregate("syms", F.lit(0), lambda acc, x: acc + F.length(x))
        != F.length("word")
    ).count()
    assert bad == 0


@pytest.mark.heavy_rotation
def test_apply_merges_equals_training_state(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges, trained = bpe.learn_bpe(docs, "text", 6, min_pair_freq=2)
    fresh = bpe.with_symbols(bpe.word_frequencies(docs, "text"))
    re_encoded = bpe.apply_merges(fresh, merges)
    a = {tuple(r["syms"]) for r in trained.collect()}
    b = {tuple(r["syms"]) for r in re_encoded.collect()}
    assert a == b


def test_duplicate_spans_planted(spark):
    s1 = "abcdefghijklmnopqrstuvwxyz0123"  # 30 chars
    s2 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ4567"  # 30 chars
    rows = [
        (1, s1 + "m" * 40 + s2),  # spans [1,30] and [71,100]
        (2, s1 + "p" * 40 + s2),
        (3, "q" * 100),  # no cross-doc duplicate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"], r["dup_frac"])
        for r in duplicate_spans(docs, "doc_id", "text", k=25).collect()
    }
    assert got == {1: (2, 60, 0.6), 2: (2, 60, 0.6)}


def test_duplicate_spans_overlap_merge(spark):
    # Shared 40-char block: 16 duplicated 25-gram starts chain into ONE
    # island (consecutive positions, gap 1 <= k) covering the block.
    shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"  # 40 chars
    docs = spark.createDataFrame(
        [(1, "x" * 10 + shared), (2, "z" * 10 + shared)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"])
        for r in duplicate_spans(docs, "doc_id", "text", k=25).collect()
    }
    assert got == {1: (1, 40), 2: (1, 40)}


def _py_fold(syms: list[str], lhs: str, rhs: str) -> list[str]:
    out: list[str] = []
    pending = None
    for x in syms:
        if pending == lhs and x == rhs:
            out.append(lhs + rhs)
            pending = None
        else:
            if pending is not None:
                out.append(pending)
            pending = x
    if pending is not None:
        out.append(pending)
    return out


def test_merge_fold_property(spark):
    # Property: the codegen'd F.aggregate fold == the canonical greedy
    # left-to-right merge, over adversarial symbol runs (a/b alphabets
    # maximize self-overlap chains). One batched Spark action checks
    # all cases.
    import itertools
    import random

    rng = random.Random(20260814)
    cases = []
    # exhaustive short strings over {a,b}
    for n in range(0, 6):
        for tup in itertools.product("ab", repeat=n):
            cases.append(list(tup))
    # random longer runs over a tiny alphabet
    for _ in range(120):
        cases.append([rng.choice("aab") for _ in range(rng.randint(6, 14))])
    for lhs, rhs in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        df = spark.createDataFrame([(c,) for c in cases], "syms array<string>")
        got = [r[0] for r in df.select(bpe.merge_pair_expr(F.col("syms"), lhs, rhs)).collect()]
        want = [_py_fold(c, lhs, rhs) for c in cases]
        assert got == want, f"fold mismatch for pair ({lhs},{rhs})"


@pytest.mark.heavy_rotation
def test_duplicate_spans_pruned_equals_stride1_fixture(spark, sf_dir):
    """r4 verdict stretch: the two-phase bucket-pruned variant must
    produce EXACTLY the stride-1 spans on fixture data at k=25 — the
    fixture corpus is adversarial for sampling schemes (over half its
    flagged docs hold only minimal 25-30-char runs), which is exactly
    why the prune is a no-false-negative bucket filter and not an
    anchor sample."""
    from yelp_etl_spark.functions.dedup import duplicate_spans_pruned

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, duplicate_spans(docs, "doc_id", "text", k=25).collect()))
    b = sorted(
        map(tuple, duplicate_spans_pruned(docs, "doc_id", "text", k=25).collect())
    )
    assert a == b and len(a) > 0


@pytest.mark.heavy_rotation
def test_duplicate_spans_pruned_planted_minimal_run(spark):
    """A minimal exactly-k duplicated run (1 gram) must survive the
    prune — the case anchor sampling drops with high probability."""
    from yelp_etl_spark.functions.dedup import duplicate_spans_pruned

    s = "abcdefghijklmnopqrstuvwxy"  # exactly 25 chars
    docs = spark.createDataFrame(
        [(1, "x" * 10 + s + "y" * 10), (2, "z" * 10 + s + "w" * 10), (3, "q" * 60)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"])
        for r in duplicate_spans_pruned(docs, "doc_id", "text", k=25).collect()
    }
    assert got == {1: (1, 25), 2: (1, 25)}


def test_winnow_guarantee_planted(spark):
    """Winnowing's hard guarantee: two documents sharing a substring of
    length >= k + w - 1 (k=25, w=4 -> 28 chars) MUST share at least one
    fingerprint, wherever the substring sits in each document (the
    property hash-mod sampling lacks). A doc too short for a full
    window yields no fingerprints."""
    from yelp_etl_spark.functions.dedup import winnow_fingerprints

    shared = "abcdefghijklmnopqrstuvwxyz01"  # exactly 28 chars
    docs = spark.createDataFrame(
        [
            (1, "x" * 13 + shared + "y" * 9),   # offset 14
            (2, "z" * 7 + shared + "w" * 30),   # offset 8 (different mod)
            (3, "q" * 26),                       # 2 grams < w: no window
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, "doc_id", "text", k=25, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared >=k+w-1 substring must share a fingerprint"
    assert 3 not in by_doc
    # selection density: far fewer fingerprints than grams
    assert len(by_doc[1]) < 51 - 24  # < number of grams
