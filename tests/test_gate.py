"""Meta-tests of the local correctness gate itself.

Round 3's only red driver row passed the LOCAL gate because its float
normalization collapsed values to 6 significant digits while the
grading driver hashes exact values (VERDICT r3, "What's wrong" #1).
These tests pin the gate's sensitivity at driver grade so that class
of gap cannot silently reopen.
"""

import math

import pytest

from tools.check_correctness import norm_cell, norm_rows


def test_gate_distinguishes_one_ulp():
    a = 1.0
    b = math.nextafter(a, 2.0)
    assert norm_cell(a) != norm_cell(b)


def test_gate_distinguishes_post_rounding_cent_flip():
    # The exact r3 failure shape: two money values one cent apart after
    # 2-dp rounding must never normalize to the same cell.
    assert norm_cell(11414149.39) != norm_cell(11414149.38)


def test_gate_rejects_driver_unhashable_cells():
    # The driver's pandas hashing dies on list/dict cells; the gate
    # must hard-fail them instead of silently tuple-converting
    # (round-1 lesson: rel_array_funcs_embeddings).
    with pytest.raises(TypeError):
        norm_cell([1, 2])
    with pytest.raises(TypeError):
        norm_cell({"k": 1})


def test_gate_compare_is_order_insensitive_but_value_exact():
    cols = ["a", "b"]
    rows1 = [(1, 2.5), (3, 4.5)]
    rows2 = [(3, 4.5), (1, 2.5)]  # same multiset, different order
    assert norm_rows(cols, rows1) == norm_rows(cols, rows2)
    rows3 = [(3, 4.5), (1, 2.5000000000000004)]  # 1-ulp value drift
    assert norm_rows(cols, rows1) != norm_rows(cols, rows3)


def test_gate_nan_and_timestamp_normalization_are_stable():
    assert norm_cell(float("nan")) == norm_cell(float("nan"))
    from datetime import datetime

    a = datetime(2026, 1, 2, 3, 4, 5, 123456)
    assert norm_cell(a) == "2026-01-02T03:04:05.123456"
