#!/usr/bin/env python
"""Dump catalog_ext.EXTRA_QUERIES surface for split validation:
ordered names, oracle SQL, descriptions, and a location-insensitive
recursive hash of each query fn's compiled code (ignores filename /
line numbers so moving source between modules compares equal)."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def code_hash(code: types.CodeType, h=None) -> str:
    h = h or hashlib.sha256()
    h.update(code.co_code)
    h.update(repr(code.co_names).encode())
    h.update(repr(code.co_varnames).encode())
    h.update(repr(code.co_freevars).encode())
    h.update(repr(code.co_cellvars).encode())
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            code_hash(const, h)
        else:
            h.update(repr(const).encode())
    return h.hexdigest()


def main(out_path: str) -> None:
    from yelp_etl_spark.plans.catalog_ext import EXTRA_QUERIES

    surface = [
        {
            "name": name,
            "fn": fn.__name__,
            "fn_hash": code_hash(fn.__code__),
            "oracle": oracle,
            "desc": desc,
        }
        for name, (fn, oracle, desc) in EXTRA_QUERIES.items()
    ]
    with open(out_path, "w") as f:
        json.dump(surface, f, indent=1)
    print(f"{len(surface)} queries → {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ext_surface.json")
