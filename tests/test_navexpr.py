"""DEFINE-navigation predicate compiler (streaming/navexpr.py)."""

from __future__ import annotations

import pytest

from flink_release_1_10_0_spark.streaming.navexpr import (
    compile_nav_predicate, has_navigation)


def ev(pred, own, allv, row, nav=None, navn=None, prev=None):
    p = compile_nav_predicate(pred, own, allv)
    return p.fn(row, nav or {}, navn or {}, prev or [])


def test_other_var_last_navigation():
    # B AS B.price > LAST(A.price)
    p = compile_nav_predicate("B.price > LAST(A.price)", "B", ["A", "B"])
    assert p.tracked == {"A": {"price": [0, 1]}}
    assert p.row_cols == frozenset({"price"})
    nav = {"A": {"price": [[5.0], [5.0]]}}
    assert p.fn({"price": 7.0}, nav, {"A": 1}, []) is True
    assert p.fn({"price": 3.0}, nav, {"A": 1}, []) is False
    # A unmatched -> NULL -> not satisfied
    assert p.fn({"price": 7.0}, {}, {}, []) is None


def test_bare_other_var_ref_is_last():
    # SQL:2016: A.price for another variable == LAST(A.price)
    p = compile_nav_predicate("price < A.price * 2", "B", ["A", "B"])
    nav = {"A": {"price": [[10.0], [10.0]]}}
    assert p.fn({"price": 19.0}, nav, {"A": 1}, []) is True
    assert p.fn({"price": 21.0}, nav, {"A": 1}, []) is False


def test_own_var_last_includes_current_row():
    # LAST(B.price) while defining B = the current row; offset 1 = the
    # previous B (Flink's canonical V-pattern uses LAST(X.price, 1))
    p = compile_nav_predicate(
        "LAST(B.price, 1) IS NULL OR B.price < LAST(B.price, 1)",
        "B", ["A", "B"])
    assert p.fn({"price": 9.0}, {}, {}, []) is True          # first B
    nav = {"B": {"price": [[8.0], [8.0]]}}
    assert p.fn({"price": 7.0}, nav, {"B": 1}, []) is True   # descending
    assert p.fn({"price": 8.5}, nav, {"B": 1}, []) is False


def test_first_navigation_offsets():
    p = compile_nav_predicate("C.v > FIRST(B.v) + FIRST(B.v, 1)",
                              "C", ["B", "C"])
    assert p.tracked["B"]["v"][0] == 2
    nav = {"B": {"v": [[1.0, 2.0], [2.0]]}}
    assert p.fn({"v": 4.0}, nav, {"B": 2}, []) is True
    assert p.fn({"v": 2.5}, nav, {"B": 2}, []) is False
    # only one B mapped -> FIRST(B.v, 1) is NULL -> predicate NULL
    nav1 = {"B": {"v": [[1.0], [1.0]]}}
    assert p.fn({"v": 4.0}, nav1, {"B": 1}, []) is None


def test_own_first_falls_back_to_current_row():
    p = compile_nav_predicate("FIRST(B.v) = v", "B", ["B"])
    # no prior B: the current row IS the first B
    assert p.fn({"v": 3.0}, {}, {"B": 0}, []) is True
    nav = {"B": {"v": [[1.0], [1.0]]}}
    assert p.fn({"v": 1.0}, nav, {"B": 1}, []) is True
    assert p.fn({"v": 3.0}, nav, {"B": 1}, []) is False


def test_prev_physical_navigation():
    p = compile_nav_predicate("U.value > PREV(U.value)", "U", ["S", "U"])
    assert p.prev_depth == 1
    assert p.fn({"value": 5.0}, {}, {}, [{"value": 3.0}]) is True
    assert p.fn({"value": 2.0}, {}, {}, [{"value": 3.0}]) is False
    assert p.fn({"value": 5.0}, {}, {}, []) is None   # no previous row
    p2 = compile_nav_predicate("value > PREV(value, 2)", "U", ["U"])
    assert p2.prev_depth == 2
    assert p2.fn({"value": 5.0}, {}, {},
                 [{"value": 9.0}, {"value": 3.0}]) is False


def test_three_valued_logic_and_arithmetic():
    assert ev("1 + 2 * 3 = 7", "A", ["A"], {}) is True
    assert ev("x > 1 AND y < 2", "A", ["A"], {"x": 5, "y": None}) is None
    assert ev("x > 1 OR y < 2", "A", ["A"], {"x": 5, "y": None}) is True
    assert ev("NOT (x = 1)", "A", ["A"], {"x": 1}) is False
    assert ev("x IS NULL", "A", ["A"], {"x": None}) is True
    assert ev("x IS NOT NULL", "A", ["A"], {"x": None}) is False
    assert ev("t = 'it''s'", "A", ["A"], {"t": "it's"}) is True
    assert ev("x / 0 IS NULL", "A", ["A"], {"x": 1}) is True


def test_rejects_next_and_unknown_grammar():
    with pytest.raises(NotImplementedError):
        compile_nav_predicate("NEXT(A.v) > 0", "A", ["A"])
    with pytest.raises(NotImplementedError):
        compile_nav_predicate("lower(A.v) = 'x'", "B", ["A", "B"])
    with pytest.raises(ValueError):
        compile_nav_predicate("LAST(Z.v) > 0", "A", ["A"])


def test_has_navigation_detector():
    assert has_navigation("B.price > LAST(A.price)", "B", ["A", "B"])
    assert has_navigation("price > A.price", "B", ["A", "B"])
    assert has_navigation("PREV(value) < value", "U", ["U"])
    assert not has_navigation("B.price > 10 AND event_type = 'x'",
                              "B", ["A", "B"])


def test_arith_accepts_decimal():
    """DecimalType columns reach the closure as decimal.Decimal —
    navigation arithmetic must not silently NULL them (review fix)."""
    from decimal import Decimal

    from flink_release_1_10_0_spark.streaming.navexpr import (
        compile_nav_predicate)

    p = compile_nav_predicate("U.value > PREV(U.value) + 1", "U", ["U"])
    assert p.fn({"value": Decimal("5.0")}, {}, {},
                [{"value": Decimal("3.0")}]) is True
    assert p.fn({"value": Decimal("3.5")}, {}, {},
                [{"value": Decimal("3.0")}]) is not True
