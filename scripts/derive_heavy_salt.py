#!/usr/bin/env python
"""Re-derive tests/conftest.py's _HEAVY_SALT from a fresh measurement.

The heavy_rotation tier runs a test when ``crc32(name + salt) % 2 ==
round % 2``; the salt is chosen so the two halves cost the same wall
time (r10 VERDICT #3 — the unsalted split once made odd-round slices
~2× even ones). Procedure (documented in conftest.py): at ROUND START,

    SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q --durations=0 \
        > /tmp/durations.log 2>/dev/null
    python -m pytest tests/ -m heavy_rotation --collect-only -q \
        2>/dev/null | grep :: > /tmp/marked.txt
    python scripts/derive_heavy_salt.py /tmp/durations.log /tmp/marked.txt

Prints the current salt's split, the best salt found, and each half's
membership under it. The salt hashes the bare test NAME (parametrized
id included), exactly like conftest's check.
"""

from __future__ import annotations

import os
import re
import sys
import zlib

SEARCH_SPACE = 200_000  # salts "0".."199999" — 0.1 s granularity needs no more


def current_salt() -> str:
    """Read the live _HEAVY_SALT from tests/conftest.py so the 'current
    split' baseline never goes stale against the shipped assignment."""
    conftest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "conftest.py",
    )
    m = re.search(r'^_HEAVY_SALT = "([^"]*)"', open(conftest).read(), re.M)
    if not m:
        raise RuntimeError("could not find _HEAVY_SALT in tests/conftest.py")
    return m.group(1)


def item_name(test_id: str) -> str:
    """Reduce a pytest node id to ``item.name`` — the component conftest
    hashes.

    Strip ONLY the leading ``path.py::`` (and any ``Class::`` /
    ``Nested::`` components before the test function): a '::' INSIDE a
    param bracket (``test_x[a::b]``) is part of item.name, so a blanket
    ``rsplit('::', 1)`` would reduce it to ``b]`` — a name conftest's
    hashing never sees (r14 ADVICE #1; the r13 fix had this hole).
    """
    rest = test_id
    while True:
        sep = rest.find("::")
        bracket = rest.find("[")
        if sep == -1 or (bracket != -1 and bracket < sep):
            break
        rest = rest[sep + 2 :]
    if not test_id.endswith(rest):
        raise ValueError(
            f"item_name parse broke reconstruction: {test_id!r} -> {rest!r}"
        )
    return rest


def parse_durations(path: str) -> dict[str, float]:
    """Sum call+setup+teardown seconds per bare test name from a pytest
    ``--durations=0`` log."""
    costs: dict[str, float] = {}
    # non-greedy up to the FIRST '.py::' so a '::' inside a param
    # bracket stays in the captured name; item_name strips any Class::
    # components (r14 ADVICE #1 — the old greedy \S+:: anchored on the
    # LAST '::', mangling test_x[a::b] to 'b]')
    pat = re.compile(
        r"^\s*(\d+\.\d+)s\s+(?:call|setup|teardown)\s+\S+?\.py::(\S+)"
    )
    for line in open(path):
        m = pat.match(line)
        if m:
            name = item_name(m.group(2))
            costs[name] = costs.get(name, 0.0) + float(m.group(1))
    return costs


def parse_marked(path: str) -> list[str]:
    """Bare test names (item.name) from a ``--collect-only -q`` listing.

    Reduce each node id with :func:`item_name` so class components are
    stripped but param-bracket '::' survives — both parsers derive the
    salt against exactly the names conftest's item.name hashing sees."""
    names = [
        item_name(line.strip())
        for line in open(path)
        if "::" in line
    ]
    bad = [n for n in names if "::" in n and "[" not in n[: n.find("::")]]
    if bad:
        raise ValueError(f"unstripped class prefix in parsed names: {bad}")
    return names


def split_cost(
    names: list[str], costs: dict[str, float], salt: str
) -> tuple[float, float, list[str], list[str]]:
    halves: tuple[list[str], list[str]] = ([], [])
    totals = [0.0, 0.0]
    for n in names:
        h = zlib.crc32((n + salt).encode()) % 2
        halves[h].append(n)
        totals[h] += costs.get(n, 0.0)
    return totals[0], totals[1], halves[0], halves[1]


def main() -> None:
    durations_log, marked_file = sys.argv[1], sys.argv[2]
    costs = parse_durations(durations_log)
    names = parse_marked(marked_file)
    missing = [n for n in names if n not in costs]
    if missing:
        print(f"WARNING: no duration recorded for {len(missing)} marked "
              f"tests (cost 0 assumed): {missing}", file=sys.stderr)
    tier_total = sum(costs.get(n, 0.0) for n in names)
    suite_total = sum(costs.values())
    print(f"marked tests: {len(names)}  tier {tier_total:.1f}s of "
          f"suite {suite_total:.1f}s (base {suite_total - tier_total:.1f}s)")

    cur = current_salt()
    c0, c1, h0, h1 = split_cost(names, costs, cur)
    print(f"current salt {cur!r}: even-half {len(h0)} tests "
          f"{c0:.1f}s | odd-half {len(h1)} tests {c1:.1f}s | diff "
          f"{abs(c0 - c1):.1f}s")

    best = (float("inf"), cur)
    for i in range(SEARCH_SPACE):
        s = str(i)
        a, b, _, _ = split_cost(names, costs, s)
        if abs(a - b) < best[0]:
            best = (abs(a - b), s)
    _, salt = best
    c0, c1, h0, h1 = split_cost(names, costs, salt)
    print(f"best salt {salt!r}: even-half {len(h0)} tests {c0:.1f}s | "
          f"odd-half {len(h1)} tests {c1:.1f}s | diff {abs(c0 - c1):.1f}s")
    print("\neven-round half (crc32%2==0):")
    for n in sorted(h0):
        print(f"  {costs.get(n, 0.0):7.1f}s  {n}")
    print("odd-round half (crc32%2==1):")
    for n in sorted(h1):
        print(f"  {costs.get(n, 0.0):7.1f}s  {n}")


if __name__ == "__main__":
    main()
