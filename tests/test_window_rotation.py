"""Pins for scripts/window_rotation.py's accounting (r11 ADVICE #5).

Two properties the rotation tool must hold so window planning stays
trustworthy: (1) standing guards are mandatory and can never be
truncated out of the proposal, no matter how large the never-checked
set grows; (2) a recorded driver row only advances a query's
last-checked round when it carried real signal — a crash or an
unexplained error must keep the query at the front of the rotation.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "window_rotation",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "window_rotation.py",
    ),
)
wr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wr)

GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 5,
    "oracle_rows": 5,
    "err": None,
}


def test_green_row_counts_as_checked():
    assert wr._counts_as_checked("flagship_revenue", GREEN)


def test_errored_row_does_not_count():
    # a crashed query must NOT age out of the rotation
    row = dict(GREEN, rows_match=None, schema_match=None, hash_match=None)
    row["err"] = "AnalysisException: boom"
    assert not wr._counts_as_checked("flagship_revenue", row)


def test_hash_mismatch_does_not_count():
    row = dict(GREEN, hash_match=False)
    assert not wr._counts_as_checked("flagship_revenue", row)


def test_no_oracle_counts_only_for_by_design_rows_only_queries():
    row = dict(
        GREEN,
        rows_match=None,
        schema_match=None,
        hash_match=None,
        oracle_rows=None,
        err="no_oracle",
    )
    # simhash_sketch is rows-only by design: a clean rows-only
    # execution is the strongest possible driver check for it
    assert wr._counts_as_checked("simhash_sketch", row)
    # pq_topk HAS a value oracle (gained round 7): a historical
    # no_oracle record predates it and must not count (this is the
    # exact case that surfaced pq_topk as never-hash-checked in r12)
    assert not wr._counts_as_checked("pq_topk", row)
    # unknown names never count
    assert not wr._counts_as_checked("not_a_query", row)


def test_guards_survive_truncation_by_large_never_set():
    names = wr.STANDING_GUARDS + [f"q{i:03d}" for i in range(100)]
    # nothing ever checked: never-checked set (100) far exceeds size
    proposal = wr.build_proposal({}, size=10, names=names)
    assert proposal[: len(wr.STANDING_GUARDS)] == wr.STANDING_GUARDS
    assert len(proposal) == 10


def test_proposal_orders_guards_never_stalest():
    names = wr.STANDING_GUARDS + ["never1", "old_r2", "older_r1", "fresh_r9"]
    seen = {"old_r2": 2, "older_r1": 1, "fresh_r9": 9}
    seen.update({g: 9 for g in wr.STANDING_GUARDS})
    proposal = wr.build_proposal(seen, size=7, names=names)
    assert proposal == wr.STANDING_GUARDS + ["never1", "older_r1", "old_r2"]
