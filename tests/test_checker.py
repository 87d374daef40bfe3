"""The correctness gate's comparator must actually discriminate — a
vacuously-passing harness would green-light everything."""

import sys

sys.path.insert(0, "/root/repo")

from tools.check_correctness import canon_cell, frame_digest


def test_digest_detects_value_changes():
    cols = ["a", "b"]
    base = frame_digest(cols, [(1, "x"), (2, "y")])
    assert frame_digest(cols, [(1, "x"), (2, "z")]) != base  # value change
    assert frame_digest(cols, [(1, "x")]) != base  # row-count change
    assert frame_digest(["a", "c"], [(1, "x"), (2, "y")]) != base  # schema change


def test_digest_order_insensitive():
    cols = ["a", "b"]
    assert frame_digest(cols, [(1, "x"), (2, "y")]) == frame_digest(cols, [(2, "y"), (1, "x")])
    # column order must not matter either (driver sorts by name)
    assert frame_digest(["b", "a"], [("x", 1), ("y", 2)]) == frame_digest(["a", "b"], [(1, "x"), (2, "y")])


def test_canon_cell_floats_and_null():
    assert canon_cell(None) == "NULL"
    assert canon_cell(2.0) == "2"  # integral floats normalize (bigint vs double)
    assert canon_cell(2.5) == canon_cell(2.5000000000001)  # 9-dp rounding
    assert canon_cell(True) == "1"
