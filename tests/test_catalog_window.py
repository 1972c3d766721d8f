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
# oracle-checked twin elsewhere in the catalog)
ROWS_ONLY_BY_DESIGN = {
    "minhash_neardup",
    "simhash_sketch",
    "approx_distinct",
    "lsh_topk",
    "ivf_topk",
    "pq_topk",
    "blob_features",
    "hll_mergeable",
}


def test_driver_window_is_first_50_entries():
    names = list(QUERIES)
    assert len(_DRIVER_WINDOW) == 50
    assert names[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)


def test_driver_window_entries_all_oracle_checked():
    no_oracle = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert no_oracle == [], f"window entries without oracle: {no_oracle}"


def test_driver_window_r5_rotation_goals():
    # r4 VERDICT tasks 1/3/5/6: the three fixed HUGEINT reds return as
    # regression guards, the two new snapshot-layer capabilities get
    # their first driver rows, and the rest of the window is the
    # never-checked pool.
    must_have = {
        # fixed r4 reds (oracle HUGEINT class)
        "compact_small_files",
        "jsonl_scan_roundtrip",
        "dq_report",
        # new snapshot-layer capabilities
        "snapshot_changelog",
        "snapshot_merge_delete",
        # the three latent-HUGEINT oracles, fixed BEFORE first check
        "bitwise_funcs",
        "token_packing",
        "stratified_sample",
        # judge-named r5 rotations (VERDICT LLM-ops table)
        "containment_pairs",
        "novelty_scores",
        "k_anonymity_audit",
        "event_path_pattern",
        "bpe_encode_tokens",
        "surrogate_ids_portable",
    }
    assert must_have <= set(_DRIVER_WINDOW)


def test_window_carries_45_first_time_rows():
    # r4 VERDICT task 3: the r5 window must rotate the never-checked
    # pool in. Derive "previously checked" from the recorded
    # CORRECTNESS_r0{1..4}.json files themselves.
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0[1234].json")):
        checked |= set(json.load(open(path)))
    assert checked, "expected CORRECTNESS_r0{1..4}.json at repo root"
    first_time = [n for n in _DRIVER_WINDOW if n not in checked]
    assert len(first_time) >= 45, (
        f"only {len(first_time)} first-time rows: {first_time}"
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
        assert QUERIES[name].oracle is not None


def test_no_duplicate_registration_lost_entries():
    # reordering + ext merge must not drop or duplicate anything
    assert len(QUERIES) == len(set(QUERIES)) >= 188
