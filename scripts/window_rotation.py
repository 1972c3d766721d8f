#!/usr/bin/env python
"""Propose the next driver-window rotation from the recorded evidence.

The correctness driver oracle-checks the FIRST 50 entries of
``catalog.QUERIES`` (pinned by ``_DRIVER_WINDOW``). Each round the
window rotates toward the weakest signal: never-checked queries first,
then the least-recently checked rows (staleness strata derived from the
committed CORRECTNESS_r*.json artifacts), with the standing guards
always present. This script derives that proposal mechanically so a
rotation is a reviewable diff, not an error-prone hand edit:

    python scripts/window_rotation.py [window_size]

Prints each catalog query's last-checked round, then the proposed
window. The builder still curates (e.g. keeping an approximate
rows-only query out in favor of its exact twin) — the output is the
starting point, and test_catalog_window.py pins whatever ships.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_etl_spark.plans.catalog import QUERIES

STANDING_GUARDS = [
    # fixed r5 reds + the flagship — re-checked every round by convention
    "map_funcs",
    "map_hof",
    "quantize_embeddings",
    "flagship_revenue",
]

# Approximate queries with no value oracle (rows-only by design) and the
# exact twin that certifies each one's math under the driver. At most ONE
# rows-only query rides per window (r11 verdict convention); the tool picks
# it by execution staleness so the cadence has an owner (r12 verdict #3).
ROWS_ONLY_TWINS = {
    "simhash_sketch": "simhash_portable",
    "minhash_neardup": "minhash_portable",
    "approx_distinct": "distinct_counts",
    "lsh_topk": "lsh_topk_checked",
    "ivf_topk": "ivf_topk_checked",
    "hll_mergeable": "hll_mergeable_checked",
    "boruvka_mst": "boruvka_mst_checked",
}


def _counts_as_checked(name: str, row: dict) -> bool:
    """A recorded driver row only counts as a CHECK when it carries
    real signal: fully green (rows+schema+hash), or — for a query that
    is rows-only BY DESIGN (no oracle in the catalog) — a clean
    ``no_oracle`` execution with a row count. A crashed query or any
    other error must NOT advance last-checked, or a standing failure
    would age out of the rotation instead of being re-run."""
    if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
        return True
    q = QUERIES.get(name)
    return (
        row.get("err") == "no_oracle"
        and q is not None
        and q.oracle is None
        and row.get("spark_rows") is not None
    )


def last_checked(root: str) -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if _counts_as_checked(name, row):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def rows_only_ranking(
    seen: dict[str, int], names: list[str] | None = None
) -> list[tuple[str, int, str, int]]:
    """Order the rows-only candidates by execution staleness.

    Returns ``(name, last_executed, twin, twin_last_green)`` tuples,
    stalest execution first (never-executed = round 0), with the twin's
    last-green round as the tiebreak (staler twin first) and the name
    as the final deterministic tiebreak. The head of this list is the
    window's single rows-only slot; the twin column makes the pair's
    combined freshness visible so a quietly-aging twin (e.g.
    hll_mergeable_checked, green r8 while its sibling last executed r6)
    is surfaced next to the pick rather than tracked by convention.
    """
    pool = ROWS_ONLY_TWINS if names is None else {
        n: t for n, t in ROWS_ONLY_TWINS.items() if n in names
    }
    return sorted(
        (
            (n, seen.get(n, 0), t, seen.get(t, 0))
            for n, t in pool.items()
        ),
        key=lambda r: (r[1], r[3], r[0]),
    )


def build_proposal(
    seen: dict[str, int], size: int, names: list[str] | None = None
) -> list[str]:
    """Guards first (mandatory every round — truncation can never
    silently drop them), then never-checked, then the single tool-chosen
    rows-only slot (stalest execution, ``rows_only_ranking``), then
    stalest-first oracle-checked rows with name tiebreak for
    determinism. Rows-only queries are excluded from the stale fill so
    the at-most-one-rows-only-per-window convention is enforced by the
    tool, not by hand-curation. Prints a visible warning when the
    never-checked backlog alone overflows the window (truncation would
    otherwise silently drop coverage)."""
    names = list(QUERIES) if names is None else names
    # ROWS_ONLY_TWINS keys never enter via the never-checked path: a
    # never-executed rows-only query ranks FIRST in rows_only_ranking
    # (round 0) and is guaranteed the single slot there, so admitting
    # them here could let two rows-only queries ride one window
    # (r13 ADVICE #1).
    never = [
        n
        for n in names
        if n not in seen
        and n not in STANDING_GUARDS
        and n not in ROWS_ONLY_TWINS
    ]
    guards = [g for g in STANDING_GUARDS if g in names]
    overflow = len(guards) + len(never) - size
    if overflow > 0:
        print(
            f"WARNING: {overflow} never-checked quer"
            f"{'y' if overflow == 1 else 'ies'} did not fit this "
            f"{size}-slot window (guards {len(guards)} + never-checked "
            f"{len(never)}); they stay at the front of the next rotation",
            file=sys.stderr,
        )
    proposal = guards + never
    ranking = rows_only_ranking(seen, names)
    rows_only_pick = ranking[0][0] if ranking else None
    if (
        rows_only_pick is not None
        and rows_only_pick not in proposal
        and len(proposal) < size
    ):
        proposal.append(rows_only_pick)
    stale = sorted(
        (
            n
            for n in names
            if n in seen
            and n not in STANDING_GUARDS
            and n not in ROWS_ONLY_TWINS
        ),
        key=lambda n: (seen[n], n),
    )
    for n in stale:
        if len(proposal) >= size:
            break
        if n not in proposal:
            proposal.append(n)
    proposal = proposal[:size]
    # a hard raise, not `assert`: python -O strips asserts, and this
    # invariant must hold in every execution mode (r14 ADVICE #4)
    if sum(n in ROWS_ONLY_TWINS for n in proposal) > 1:
        raise RuntimeError(
            "at-most-one-rows-only-per-window invariant violated: "
            f"{[n for n in proposal if n in ROWS_ONLY_TWINS]}"
        )
    return proposal


def twin_disposition(
    proposal: list[str],
    seen: dict[str, int],
    size: int,
    names: list[str] | None = None,
) -> str | None:
    """Describe where the rows-only slot's oracle twin stands.

    When the single rows-only slot is spent, its exact twin either rides
    the same window or is queued in the stale fill — in which case this
    names the twin's last-green round and estimates its arrival from the
    stale-queue position and the window's per-round stale capacity. Pure
    reporting (r13 verdict #6): keeps the twin debt visible without
    burning a window slot on it. Returns None when no rows-only query is
    in the proposal."""
    picked = [n for n in proposal if n in ROWS_ONLY_TWINS]
    if not picked:
        return None
    pick = picked[0]
    twin = ROWS_ONLY_TWINS[pick]
    if twin in proposal:
        return f"rows-only slot {pick}: twin {twin} rides THIS window"
    names = list(QUERIES) if names is None else names
    if twin not in seen:
        return (
            f"rows-only slot {pick}: twin {twin} NEVER driver-checked "
            "(front of the next rotation's never-checked backlog)"
        )
    stale = sorted(
        (
            n
            for n in names
            if n in seen
            and n not in STANDING_GUARDS
            and n not in ROWS_ONLY_TWINS
        ),
        key=lambda n: (seen[n], n),
    )
    if twin not in stale:
        # twin checked historically but outside the caller's name
        # universe (partial-catalog invocations) — report the fact
        # without a queue estimate rather than raising on index()
        return (
            f"rows-only slot {pick}: twin {twin} last green "
            f"r{seen[twin]} (outside this proposal's query universe)"
        )
    capacity = max(
        1, size - len([g for g in STANDING_GUARDS if g in names]) - 1
    )
    # never-checked rows jump the stale queue every round, so they
    # consume stale slots ahead of the twin — fold the backlog into the
    # twin's effective queue position or the '~N rounds' figure
    # understates arrival when new queries are pending (r14 ADVICE #3)
    backlog = len(
        [
            n
            for n in names
            if n not in seen
            and n not in STANDING_GUARDS
            and n not in ROWS_ONLY_TWINS
        ]
    )
    rounds_away = max(1, (stale.index(twin) + backlog) // capacity)
    backlog_note = (
        f" (+{backlog} never-checked ahead of the queue)" if backlog else ""
    )
    return (
        f"rows-only slot {pick}: twin {twin} last green r{seen[twin]}, "
        f"queued behind {stale.index(twin)} staler rows{backlog_note} — "
        f"arrives with its stratum in ~{rounds_away} round"
        f"{'s' if rounds_away != 1 else ''}"
    )


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = last_checked(root)

    print("# last-checked round per catalog query")
    for n in sorted(
        (n for n in QUERIES if n in seen and n not in STANDING_GUARDS),
        key=lambda n: (seen[n], n),
    ):
        print(f"{seen[n]:>3}  {n}")
    for n in QUERIES:
        if n not in seen:
            print(f"  -  {n}  (NEVER driver-checked)")

    print("\n# rows-only freshness (last EXECUTED vs twin's last GREEN;")
    print("# head of this list is the window's single rows-only slot)")
    for n, exec_rnd, twin, twin_rnd in rows_only_ranking(seen):
        print(
            f"  exec r{exec_rnd or '-'}  {n:<18} twin {twin:<22} "
            f"green r{twin_rnd or '-'}"
        )

    proposal = build_proposal(seen, size)

    print(f"\n# proposed {size}-query window (guards + never-checked")
    print("# + one rows-only slot + stalest)")
    for n in proposal[:size]:
        tag = "NEVER" if n not in seen else f"r{seen[n]}"
        oracle = "oracle" if QUERIES[n].oracle is not None else "rows-only"
        print(f"  {n}  [{tag}, {oracle}]")

    disposition = twin_disposition(proposal, seen, size)
    if disposition is not None:
        print(f"\n# {disposition}")

    print("\n# paste-ready tuple (curate before shipping; the window")
    print("# tests in test_catalog_window.py pin whatever lands)")
    print("_DRIVER_WINDOW: tuple[str, ...] = (")
    for n in proposal[:size]:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
