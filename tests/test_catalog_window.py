"""Catalog registration invariants.

The driver's correctness gate oracle-verifies the FIRST 50 entries of
``catalog.QUERIES`` in insertion order. These tests pin the curated
window (every entry oracle-checked, the round's rotation goals met)
and the extension-catalog registration so a refactor can't silently
shrink the hard correctness signal again (round-1 VERDICT: 84/134
queries fell outside the window; catalog_ext was dead).
"""

from __future__ import annotations

from yelp_etl_spark.plans.catalog import _DRIVER_WINDOW, QUERIES
from yelp_etl_spark.plans.catalog_ext import EXTRA_QUERIES

# approximate/sketch queries whose outputs are seed- or
# error-bound-dependent: rows-only by design (each has an exact
# oracle-checked twin elsewhere in the catalog). pq_topk left this set
# in round 7: its default codebook sample became the exact id-range
# grid, so the full encode/ADC/rank path now carries a value oracle.
ROWS_ONLY_BY_DESIGN = {
    "minhash_neardup",
    "simhash_sketch",
    "approx_distinct",
    "lsh_topk",
    "ivf_topk",
    "hll_mergeable",
    # iterative contraction is not SQL-expressible; the in-query
    # forest identity |MST| = |V| - #components checks against
    # independent label-propagation components, and the edge-for-edge
    # Kruskal twin lives in test_boruvka_matches_kruskal_fixture
    "boruvka_mst",
}


def test_driver_window_is_first_50_entries():
    names = list(QUERIES)
    assert len(_DRIVER_WINDOW) == 50
    assert names[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)


def test_driver_window_entries_all_oracle_checked():
    # boruvka_mst is rows-only by design (iterative contraction is not
    # SQL-expressible; it enters the r10 window for the driver's weaker
    # rows-only check so cumulative coverage reaches every catalog
    # entry); everything else must be hard-checked
    no_oracle = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert set(no_oracle) <= {"boruvka_mst"}, (
        f"window entries without oracle: {no_oracle}"
    )


def test_driver_window_r10_rotation_goals():
    # r9 VERDICT task 1: the 34 never-driver-checked round-9 queries
    # (the r9 _NEXT_ROTATION_POOL seed) all enter, closing cumulative
    # driver coverage at 359/359, plus the standing guards and 12
    # stalest (round-2) oracle greens re-verified under the current
    # hasher (r9 VERDICT task 6).
    must_have = {
        # standing guards: the fixed r5 reds + flagship
        "map_funcs",
        "map_hof",
        "quantize_embeddings",
        "flagship_revenue",
        # the 34 never-checked round-9 rows
        "bollinger_anomaly_days",
        "boruvka_mst",
        "cidr_block_join",
        "conformal_interval_coverage",
        "cronbach_alpha",
        "dbscan_core_classification",
        "diversity_indices",
        "dsir_importance_weights",
        "dunning_g2_collocations",
        "durbin_watson_ols",
        "fd_discovery",
        "gazetteer_entity_match",
        "gopher_quality_rules",
        "hamming_binary_topk",
        "heaps_law_fit",
        "jarque_bera",
        "kendall_tau_daily",
        "kneser_ney_bigram_nll",
        "kruskal_wallis_h",
        "ktruss_support",
        "lift_gains_deciles",
        "matryoshka_prefix_recall",
        "misra_gries_heavy_hitters",
        "mode_per_group",
        "pacf_daily",
        "readability_scores",
        "shapley_attribution",
        "stream_chained_windows",
        "t_closeness_audit",
        "temporal_purged_split",
        "url_normalize_dedup",
        "wasserstein1_drift",
        "welch_ttest",
        "zip_central_dir_parse",
        # stalest greens re-enter (last checked r2)
        "date_features",
        "distinct_counts",
        "events_tumbling_window",
        "explode_tokens",
        "filter_project",
        "flatten_struct",
        "join_left_counts",
        "join_semi_anti",
        "json_map_extract",
        "math_funcs",
        "pivot_status",
        "regex_clean",
    }
    assert must_have <= set(_DRIVER_WINDOW)


def test_window_closes_cumulative_driver_coverage():
    # r9 VERDICT task 1: window ∪ previously-checked must cover the
    # ENTIRE catalog — after this round no query has ever been skipped
    # by the driver. Derive "previously checked" from the recorded
    # CORRECTNESS_r0{1..9}.json files themselves.
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0[1-9].json")):
        checked |= set(json.load(open(path)))
    assert checked, "expected CORRECTNESS_r0{1..9}.json at repo root"
    first_time = [n for n in _DRIVER_WINDOW if n not in checked]
    # the 34 never-checked round-9 rows
    assert len(first_time) >= 34, (
        f"only {len(first_time)} first-time rows: {first_time}"
    )
    from yelp_etl_spark.plans.catalog import _NEXT_ROTATION_POOL

    uncovered = [
        n for n in QUERIES if n not in checked and n not in _DRIVER_WINDOW
    ]
    # late-session additions must be explicitly declared as the r9 seed
    assert set(uncovered) <= _NEXT_ROTATION_POOL, (
        f"never driver-checked, not in window, not declared for the "
        f"next rotation: {sorted(set(uncovered) - _NEXT_ROTATION_POOL)}"
    )


def test_rotated_out_rows_remain_oracle_checked_locally():
    # rotation must never DROP a query from the catalog: everything
    # outside the window stays registered and oracle-checked by the
    # local parity gate, except the pinned approximate rows-only set
    missing = [
        n
        for n, spec in QUERIES.items()
        if n not in _DRIVER_WINDOW
        and spec.oracle is None
        and n not in ROWS_ONLY_BY_DESIGN
    ]
    assert missing == [], f"non-window queries lost their oracle: {missing}"
    # and the rows-only set itself must not silently grow
    actually_rows_only = {n for n, s in QUERIES.items() if s.oracle is None}
    assert actually_rows_only == ROWS_ONLY_BY_DESIGN


def test_extension_catalog_registered():
    for name in EXTRA_QUERIES:
        assert name in QUERIES, f"catalog_ext query {name!r} not registered"
        if name not in ROWS_ONLY_BY_DESIGN:
            assert QUERIES[name].oracle is not None


def test_no_duplicate_registration_lost_entries():
    # reordering + ext merge must not drop or duplicate anything
    assert len(QUERIES) == len(set(QUERIES)) >= 188


def test_bench_rotation_covers_the_whole_catalog():
    # every catalog query must be registered in bench.BENCH_QUERIES (the
    # rotation universe) and vice versa — a new query that never enters
    # the bench rotation silently escapes per-round timing (caught
    # manually in r10 when boruvka_mst_checked landed after the bench
    # list froze; this pins it)
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import BENCH_QUERIES

    assert set(BENCH_QUERIES) == set(QUERIES)
    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))  # no duplicates
