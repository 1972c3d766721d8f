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
    # one representative per family that the round-1 verdict called out,
    # plus the round-3 rotation's never-before-driver-checked entries
    # (VERDICT r2 task #1: union hard coverage must GROW each round)
    must_have = {
        "join_full_outer",
        "tpch_q5_region_revenue",
        "tpch_q21_shape",
        "merge_upsert",
        "scd2_history",
        "pandas_udf_scores",
        "pandas_zscore",
        "stream_static_enrich",
        "minhash_portable",
        "simhash_portable",
        "neardup_components",
        "funnel_conversion",
        "bfs_reachability",
        # r3 rotation
        "tpch_q2_min_cost",
        "triangle_count",
        "copurchase_pairs",
        "decontaminate_docs",
        "repetition_flags",
        "bm25_search",
        "pagerank",
        "salted_join_agg",
        "two_stage_topk",
        "fuzzy_match_parts",
        "pagerank_dict_ids",
        "semantic_dedup_pipeline",
        "stream_dedup_totals",
        # r3b rotation: write-side roundtrips + prefix-filter join
        "partitioned_write_roundtrip",
        "compact_small_files",
        "dynamic_overwrite_publish",
        "jaccard_prefix_join",
        "incremental_agg_maintenance",
        "cross_doc_boilerplate",
        "asof_tolerance",
        "xml_extract",
        "collation_group",
    }
    assert must_have <= set(_DRIVER_WINDOW)


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
