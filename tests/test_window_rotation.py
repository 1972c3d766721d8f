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


def test_truncated_never_checked_backlog_warns(capsys):
    # r12 ADVICE: dropping never-checked rows must be visible, not silent
    names = wr.STANDING_GUARDS + [f"q{i:03d}" for i in range(100)]
    wr.build_proposal({}, size=10, names=names)
    err = capsys.readouterr().err
    assert "WARNING" in err and "94 never-checked queries did not fit" in err
    # no warning when everything fits
    wr.build_proposal({}, size=200, names=names)
    assert "WARNING" not in capsys.readouterr().err


def test_rows_only_ranking_orders_by_execution_then_twin_green():
    # r12 verdict #3: the rows-only slot is chosen by last-EXECUTED round,
    # with the exact twin's last-green round surfaced as the tiebreak
    seen = {
        "hll_mergeable": 6,
        "hll_mergeable_checked": 8,
        "simhash_sketch": 12,
        "simhash_portable": 11,
        "boruvka_mst": 10,
        "boruvka_mst_checked": 11,
        # minhash_neardup and approx_distinct both executed r11; the
        # staler twin (minhash_portable r8 < distinct_counts r10) wins
        "minhash_neardup": 11,
        "minhash_portable": 8,
        "approx_distinct": 11,
        "distinct_counts": 10,
    }
    ranking = wr.rows_only_ranking(seen, names=list(seen))
    assert ranking[0] == ("hll_mergeable", 6, "hll_mergeable_checked", 8)
    assert ranking[1] == ("boruvka_mst", 10, "boruvka_mst_checked", 11)
    assert ranking[2] == ("minhash_neardup", 11, "minhash_portable", 8)
    assert ranking[3] == ("approx_distinct", 11, "distinct_counts", 10)
    assert ranking[-1][0] == "simhash_sketch"
    # a never-executed rows-only query ranks first (round 0)
    seen2 = dict(seen)
    del seen2["boruvka_mst"]
    ranking2 = wr.rows_only_ranking(seen2, names=list(seen))
    assert ranking2[0] == ("boruvka_mst", 0, "boruvka_mst_checked", 11)


def test_never_checked_rows_only_cannot_double_the_slot():
    # r13 ADVICE #1: two never-executed rows-only queries must not both
    # enter via the never-checked path — the stalest one takes the single
    # slot (via rows_only_ranking, never-executed ranks first) and the
    # other waits for a future window
    rows_only = list(wr.ROWS_ONLY_TWINS)
    others = [f"q{i:03d}" for i in range(20)]
    names = wr.STANDING_GUARDS + rows_only + others
    seen = {n: 3 for n in names}
    # TWO rows-only queries with no record at all
    del seen["hll_mergeable"], seen["boruvka_mst"]
    proposal = wr.build_proposal(seen, size=15, names=names)
    picked = [n for n in proposal if n in wr.ROWS_ONLY_TWINS]
    assert len(picked) == 1
    # deterministic pick: both exec r0, twins absent from seen (r0),
    # name tiebreak → boruvka_mst
    assert picked == ["boruvka_mst"]


def test_twin_disposition_reports_queue_position():
    # r13 verdict #6: the tool names the twin's standing when the
    # rows-only slot is spent
    rows_only = list(wr.ROWS_ONLY_TWINS)
    twins = list(wr.ROWS_ONLY_TWINS.values())
    others = [f"q{i:03d}" for i in range(60)]
    names = wr.STANDING_GUARDS + rows_only + twins + others
    seen = {n: 5 for n in names}
    seen["boruvka_mst"] = 2  # stalest execution → the pick
    seen["boruvka_mst_checked"] = 3  # stalest stale row → rides along
    proposal = wr.build_proposal(seen, size=15, names=names)
    assert proposal[len(wr.STANDING_GUARDS)] == "boruvka_mst"
    msg = wr.twin_disposition(proposal, seen, size=15, names=names)
    assert msg == (
        "rows-only slot boruvka_mst: twin boruvka_mst_checked rides "
        "THIS window"
    )
    # push the twin deep into the stale queue → arrival estimate
    seen["boruvka_mst_checked"] = 9
    proposal = wr.build_proposal(seen, size=15, names=names)
    msg = wr.twin_disposition(proposal, seen, size=15, names=names)
    assert "last green r9" in msg and "arrives with its stratum" in msg
    # no rows-only query in the proposal → nothing to report
    assert wr.twin_disposition(["q001", "q002"], seen, size=15) is None
    # twin recorded in seen but outside the caller's name universe:
    # report without a queue estimate rather than raising on index()
    names_no_twin = [n for n in names if n != "boruvka_mst_checked"]
    proposal = wr.build_proposal(seen, size=15, names=names_no_twin)
    msg = wr.twin_disposition(proposal, seen, size=15, names=names_no_twin)
    assert msg == (
        "rows-only slot boruvka_mst: twin boruvka_mst_checked last "
        "green r9 (outside this proposal's query universe)"
    )
    # a never-checked twin normally enters the proposal via the
    # never-checked path and rides the same window
    seen_no_twin = {k: v for k, v in seen.items()
                    if k != "boruvka_mst_checked"}
    proposal = wr.build_proposal(seen_no_twin, size=15, names=names)
    assert "boruvka_mst_checked" in proposal
    msg = wr.twin_disposition(proposal, seen_no_twin, size=15, names=names)
    assert msg.endswith("rides THIS window")
    # but if the never-checked backlog squeezed it out of the window,
    # the front-of-backlog message names that state instead of raising
    msg = wr.twin_disposition(
        ["boruvka_mst"], seen_no_twin, size=15, names=names
    )
    assert "NEVER driver-checked" in msg


def test_twin_arrival_estimate_counts_never_checked_backlog():
    # r14 ADVICE #3: never-checked rows jump the stale queue every
    # round, so pending new queries consume stale slots ahead of the
    # twin — the '~N rounds' figure must fold the backlog in, not
    # assume an empty queue
    rows_only = list(wr.ROWS_ONLY_TWINS)
    twins = list(wr.ROWS_ONLY_TWINS.values())
    others = [f"q{i:03d}" for i in range(60)]
    backlog = [f"new{i:02d}" for i in range(8)]
    names = wr.STANDING_GUARDS + rows_only + twins + others + backlog
    seen = {n: 5 for n in names if n not in backlog}
    seen["boruvka_mst"] = 2  # stalest execution → the pick
    seen["boruvka_mst_checked"] = 9  # back of the stale queue
    proposal = wr.build_proposal(seen, size=15, names=names)
    msg = wr.twin_disposition(proposal, seen, size=15, names=names)
    # stale queue: 6 other twins + 60 others at r5, twin last at r9 →
    # index 66; capacity = 15 - 4 guards - 1 rows-only = 10; with the
    # 8-row backlog the estimate is (66+8)//10 = 7, not 66//10 = 6
    assert "(+8 never-checked ahead of the queue)" in msg
    assert "~7 rounds" in msg
    # empty backlog → no note, original estimate
    names_nb = wr.STANDING_GUARDS + rows_only + twins + others
    proposal = wr.build_proposal(seen, size=15, names=names_nb)
    msg = wr.twin_disposition(proposal, seen, size=15, names=names_nb)
    assert "never-checked ahead" not in msg
    assert "~6 rounds" in msg


def test_proposal_contains_exactly_one_rows_only_slot():
    # the at-most-one convention is tool-enforced: the stalest-executed
    # rows-only query rides; the other six never enter the stale fill
    rows_only = list(wr.ROWS_ONLY_TWINS)
    twins = list(wr.ROWS_ONLY_TWINS.values())
    others = [f"q{i:03d}" for i in range(20)]
    names = wr.STANDING_GUARDS + rows_only + twins + others
    seen = {n: 3 for n in names}
    seen["hll_mergeable"] = 2  # stalest execution → the pick
    proposal = wr.build_proposal(seen, size=15, names=names)
    picked = [n for n in proposal if n in wr.ROWS_ONLY_TWINS]
    assert picked == ["hll_mergeable"]
    # guards lead, then the rows-only slot, then the stale fill
    assert proposal[: len(wr.STANDING_GUARDS)] == wr.STANDING_GUARDS
    assert proposal[len(wr.STANDING_GUARDS)] == "hll_mergeable"
    assert len(proposal) == 15
