"""Pins for scripts/derive_heavy_salt.py's parsers (r13 ADVICE #3).

The two parsers must agree on the SAME name component — conftest's
heavy_rotation check hashes item.name (the last '::' component), so a
class-based test id (``file::Class::test``) must reduce identically in
both the marked list and the durations log, or the derived salt would
be balanced against names conftest never hashes.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "derive_heavy_salt",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "derive_heavy_salt.py",
    ),
)
dhs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dhs)


def test_parse_marked_uses_last_component(tmp_path):
    marked = tmp_path / "marked.txt"
    marked.write_text(
        "tests/test_a.py::test_plain\n"
        "tests/test_b.py::TestClass::test_in_class\n"
        "tests/test_c.py::test_param[events-3]\n"
        "no-separator line is skipped\n"
    )
    assert dhs.parse_marked(str(marked)) == [
        "test_plain",
        "test_in_class",
        "test_param[events-3]",
    ]


def test_parsers_agree_on_class_based_ids(tmp_path):
    # the durations regex (\S+::(name)) is greedy to the LAST '::' —
    # parse_marked must land on the same component
    log = tmp_path / "durations.log"
    log.write_text(
        "  1.50s call     tests/test_b.py::TestClass::test_in_class\n"
        "  0.25s setup    tests/test_b.py::TestClass::test_in_class\n"
        "  2.00s call     tests/test_a.py::test_plain\n"
    )
    costs = dhs.parse_durations(str(log))
    assert costs == {"test_in_class": 1.75, "test_plain": 2.0}
    marked = tmp_path / "marked.txt"
    marked.write_text("tests/test_b.py::TestClass::test_in_class\n")
    names = dhs.parse_marked(str(marked))
    assert all(n in costs for n in names)
