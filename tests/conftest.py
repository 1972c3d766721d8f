from __future__ import annotations

import os
import sys
import zlib

import pytest

from yelp_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Heavy-test rotation tier (r8 VERDICT #2: the suite needs the same
# rotation discipline the bench got — the property/model/replay
# RE-verification tests cost ~140 s together and re-prove invariants
# that don't change unless their operator changes). Rule: a test marked
# ``heavy_rotation`` runs when crc32(test_name) % 2 == round % 2, so
# every marked test runs at least every other round and each round's
# slice is deterministic. Round = 1 + max committed BENCH_r{N}.json
# (bench.detect_round's rule; SPARK_GRAFT_ROUND overrides).
# SPARK_GRAFT_FULL_TESTS=1 runs everything (use before shipping a
# round and whenever a marked test's operator changed).
# KNOWN IMBALANCE (measured r10): the crc32 split is cost-uneven —
# the odd-round half carries ~25 marked tests vs ~12 on even rounds
# (r10 dedicated wall 467-479 s; simulated r11 ~535 s, all green). If
# the r11 wall matters, rebalance by salting the hash (crc32(name +
# SALT)) chosen against measured per-test durations — do it at the
# START of a round so the whole round is measured under one assignment.
# ---------------------------------------------------------------------------


def _current_round() -> int:
    # the ONE round-detection rule lives in bench.detect_round — the
    # test tier and the bench rotation must never disagree on the round
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    from bench import detect_round

    return detect_round(root)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy_rotation: expensive property/model/replay re-verification;"
        " runs when crc32(name) %% 2 == round %% 2 (every other round)."
        " SPARK_GRAFT_FULL_TESTS=1 forces all.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    rnd = _current_round()
    for item in items:
        if item.get_closest_marker("heavy_rotation") is None:
            continue
        if zlib.crc32(item.name.encode()) % 2 != rnd % 2:
            item.add_marker(
                pytest.mark.skip(
                    reason=(
                        f"heavy_rotation tier: off-round (round {rnd}); "
                        "runs next round — SPARK_GRAFT_FULL_TESTS=1 forces"
                    )
                )
            )


@pytest.fixture(scope="session")
def spark():
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="spark_warehouse_")
    spark = get_spark(
        "yelp-etl-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
