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


def last_checked(root: str) -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name in json.load(open(path)):
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = last_checked(root)

    never = [n for n in QUERIES if n not in seen]
    # stalest first; ties broken by catalog name for determinism
    stale = sorted(
        (n for n in QUERIES if n in seen and n not in STANDING_GUARDS),
        key=lambda n: (seen[n], n),
    )

    print("# last-checked round per catalog query")
    for n in stale:
        print(f"{seen[n]:>3}  {n}")
    for n in never:
        print(f"  -  {n}  (NEVER driver-checked)")

    proposal = list(dict.fromkeys(never + STANDING_GUARDS))
    for n in stale:
        if len(proposal) >= size:
            break
        proposal.append(n)

    print(f"\n# proposed {size}-query window (never-checked + guards + stalest)")
    for n in proposal[:size]:
        tag = "NEVER" if n not in seen else f"r{seen[n]}"
        oracle = "oracle" if QUERIES[n].oracle is not None else "rows-only"
        print(f"  {n}  [{tag}, {oracle}]")


if __name__ == "__main__":
    main()
