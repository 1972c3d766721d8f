"""Catalog registration invariants.

The driver's correctness gate oracle-verifies the FIRST 50 entries of
``catalog.QUERIES`` in insertion order. These tests pin the curated
window (every operator family represented, every window entry
oracle-checked) and the extension-catalog registration so a refactor
can't silently shrink the hard correctness signal again (round-1
VERDICT: 84/134 queries fell outside the window; catalog_ext was dead).
"""

from __future__ import annotations

from yelp_etl_spark.plans.catalog import _DRIVER_WINDOW, QUERIES
from yelp_etl_spark.plans.catalog_ext import EXTRA_QUERIES


def test_driver_window_is_first_50_entries():
    names = list(QUERIES)
    assert len(_DRIVER_WINDOW) == 50
    assert names[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)


def test_driver_window_entries_all_oracle_checked():
    no_oracle = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert no_oracle == [], f"window entries without oracle: {no_oracle}"


def test_driver_window_spans_operator_families():
    # r4 rotation (VERDICT r3 task #2): >=35 first-time rows — all 18
    # never-checked TPC-H shapes, the sketch/curation/time-series pool,
    # and the two new ANN oracle twins — while each previously-verified
    # family keeps one green representative, plus every query whose
    # implementation changed this round (cast probe, write roundtrips,
    # graph broadcast paths, prefix join).
    must_have = {
        # kept representatives / r4 regression guards
        "flagship_revenue",
        "safe_cast_probe",
        "compact_small_files",
        "time_travel_diff",
        "pagerank",
        "bfs_reachability",
        "jaccard_prefix_join",
        "incremental_dedup_delta",
        "pq_topk_checked",
        "jsonl_scan_roundtrip",
        "merge_upsert",
        # first-time rows (sample; the full window is pinned above)
        "bpe_pair_counts",
        "bpe_merges",
        "bpe_corpus_tokens",
        "duplicate_spans",
        "tpch_q3_shipping",
        "tpch_q9_profit",
        "tpch_q13_custdist",
        "tpch_q17_small_quantity",
        "tpch_q22_global_sales",
        "tfidf_top_terms",
        "sessionize_gaps",
        "dq_report",
        "bloom_prune_join",
        "histogram_quantiles",
        "grouped_histogram_quantiles",
        "mixture_sample",
        "shard_layout",
        "skyline_suppliers",
        "twap_value",
        "mad_outliers",
        "ewma_smooth",
        "rolling_fingerprint",
        "stream_stream_attrib",
        "abandoned_views",
        "lsh_topk_checked",
        "ivf_topk_checked",
    }
    assert must_have <= set(_DRIVER_WINDOW)


def test_window_carries_35_first_time_rows():
    # VERDICT r3 task #2: the r4 window must carry >=35 rows the driver
    # has NEVER hard-checked. Derive "previously checked" from the
    # recorded CORRECTNESS_r0{1,2,3}.json files themselves.
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0[123].json")):
        checked |= set(json.load(open(path)))
    assert checked, "expected CORRECTNESS_r0{1,2,3}.json at repo root"
    first_time = [n for n in _DRIVER_WINDOW if n not in checked]
    assert len(first_time) >= 35, (
        f"only {len(first_time)} first-time rows: {first_time}"
    )


def test_rotated_out_rows_remain_oracle_checked_locally():
    # rotation must not drop the r1/r2 rows from the catalog — they
    # stay behind the window under the local parity gate
    rotated_out = {
        "filter_project",
        "case_when_tiers",
        "date_features",
        "explode_tokens",
        "array_access",
        "json_map_extract",
        "flatten_struct",
        "sort_limit_topk",
        "window_analytic",
        "join_left_counts",
        "join_semi_anti",
        "set_ops",
        "rollup_orders",
        "distinct_counts",
        "regex_clean",
        "string_funcs",
        "math_funcs",
        "pivot_status",
        # r3b: twice-driver-green rows yielding their slots
        "events_tumbling_window",
        "sliding_window",
        "session_window",
        "dedup_exact",
        "text_stats",
        "bitmap_distinct",
        "range_join",
        "lang_id",
        "cosine_topk",
        # r4: once-or-twice-green r3 rows yielding their slots to the
        # first-time pool (each family keeps a representative in-window)
        "pricing_summary",
        "countif_probe",
        "window_topk",
        "join_full_outer",
        "asof_join",
        "asof_tolerance",
        "tpch_q2_min_cost",
        "interval_overlap",
        "snapshot_diff_cdc",
        "count_min_freq",
        "salted_join_agg",
        "two_stage_topk",
        "pagerank_dict_ids",
        "triangle_count",
        "copurchase_pairs",
        "decontaminate_docs",
        "repetition_flags",
        "variant_props",
        "bm25_search",
        "unigram_nll_score",
        "fuzzy_match_parts",
        "semantic_dedup_pipeline",
        "incremental_agg_maintenance",
        "cross_doc_boilerplate",
        "stream_static_enrich",
        "pandas_udf_scores",
        "tpch_q5_region_revenue",
        "tpch_q21_shape",
        "quality_score",
        "xml_extract",
        "collation_group",
        "ngram_jaccard_pairs",
        "minhash_portable",
        "simhash_portable",
        "neardup_components",
        "funnel_conversion",
        "scd2_history",
        "pandas_zscore",
        "embedding_neardup_lsh",
        "dynamic_overwrite_publish",
        # r4 late rotation: yielded slots to BPE + duplicate_spans
        "enrich_obt",
        "partitioned_write_roundtrip",
        "stream_dedup_totals",
        "tpch_q6_sql",
    }
    for name in rotated_out:
        assert name in QUERIES and QUERIES[name].oracle is not None
        assert name not in _DRIVER_WINDOW


def test_extension_catalog_registered():
    for name in EXTRA_QUERIES:
        assert name in QUERIES, f"catalog_ext query {name!r} not registered"
        assert QUERIES[name].oracle is not None


def test_no_duplicate_registration_lost_entries():
    # reordering + ext merge must not drop or duplicate anything
    assert len(QUERIES) == len(set(QUERIES)) >= 153
