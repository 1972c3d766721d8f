"""Pins for scripts/derive_heavy_salt.py's parsers (r13 ADVICE #3,
r14 ADVICE #1).

The two parsers must agree on the SAME name component — conftest's
heavy_rotation check hashes item.name, so a class-based test id
(``file::Class::test``) must strip the class, while a '::' INSIDE a
param bracket (``test_x[a::b]``) must survive intact: item.name keeps
the full bracket, and a blanket rsplit would hash 'b]' instead.
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
        "tests/test_d.py::test_sep_param[a::b]\n"
        "tests/test_e.py::TestClass::test_cls_param[x::y-2]\n"
        "no-separator line is skipped\n"
    )
    assert dhs.parse_marked(str(marked)) == [
        "test_plain",
        "test_in_class",
        "test_param[events-3]",
        "test_sep_param[a::b]",
        "test_cls_param[x::y-2]",
    ]


def test_parsers_agree_on_class_based_ids(tmp_path):
    # both parsers must reduce a node id to item.name: strip file and
    # class components, keep the param bracket verbatim (r14 ADVICE #1:
    # the old greedy \S+:: regex anchored on the LAST '::', mangling
    # test_x[a::b] to 'b]')
    log = tmp_path / "durations.log"
    log.write_text(
        "  1.50s call     tests/test_b.py::TestClass::test_in_class\n"
        "  0.25s setup    tests/test_b.py::TestClass::test_in_class\n"
        "  2.00s call     tests/test_a.py::test_plain\n"
        "  0.75s call     tests/test_d.py::test_sep_param[a::b]\n"
        "  0.10s setup    tests/test_d.py::test_sep_param[a::b]\n"
    )
    costs = dhs.parse_durations(str(log))
    assert costs == {
        "test_in_class": 1.75,
        "test_plain": 2.0,
        "test_sep_param[a::b]": 0.85,
    }
    marked = tmp_path / "marked.txt"
    marked.write_text(
        "tests/test_b.py::TestClass::test_in_class\n"
        "tests/test_d.py::test_sep_param[a::b]\n"
    )
    names = dhs.parse_marked(str(marked))
    assert all(n in costs for n in names)
