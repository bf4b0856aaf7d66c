"""MATCH_RECOGNIZE DEFINE navigation end-to-end: cross-variable
LAST/FIRST and physical PREV through the SQL clause + NFA stack.

Reference: flink-table-planner-blink/.../codegen/MatchCodeGenerator.scala
(navigation codegen), flink-cep/.../nfa/NFA.java:85 (match buffer)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _events(spark, rows):
    df = (spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double")
        .withColumn("ts", F.col("ts").cast("timestamp")))
    return df


def _run(spark, df, sql):
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)
    import tempfile
    src = tempfile.mkdtemp(prefix="mrnav_src_")
    df.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    return execute_match_recognize_sql(spark, sql, batch_df=df,
                                       stream_df=stream)


def test_cross_variable_last_in_define(spark):
    """B AS B.value > LAST(A.value): only runs whose B exceeds the
    matched A's value survive; C must drop below FIRST(B.value)."""
    rows = [(1, "2024-01-01 10:00:00", 1, "click", 10.0),
            (2, "2024-01-01 10:01:00", 1, "view", 15.0),   # > 10 ✓
            (3, "2024-01-01 10:02:00", 1, "view", 20.0),   # > 10 ✓
            (4, "2024-01-01 10:03:00", 1, "purchase", 12.0),  # < 15 ✓
            # second candidate start: A=20-click, B=5 fails nav
            (5, "2024-01-01 10:04:00", 1, "click", 20.0),
            (6, "2024-01-01 10:05:00", 1, "view", 5.0),
            (7, "2024-01-01 10:06:00", 1, "view", 6.0),
            (8, "2024-01-01 10:07:00", 1, "purchase", 1.0)]
    df = _events(spark, rows)
    out = _run(spark, df, """
        SELECT user_id, a_val, b_first, b_last, c_val
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.value) AS a_val, FIRST(B.value) AS b_first,
                   LAST(B.value) AS b_last, LAST(C.value) AS c_val
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B{2} C)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'view' AND B.value > LAST(A.value),
                 C AS event_type = 'purchase' AND C.value < FIRST(B.value)
        )""").collect()
    assert [(r.user_id, r.a_val, r.b_first, r.b_last, r.c_val)
            for r in out] == [(1, 10.0, 15.0, 20.0, 12.0)]


def test_bare_other_variable_reference_is_last(spark):
    """SQL:2016 sugar: C AS C.value > A.value means LAST(A.value)."""
    rows = [(1, "2024-01-01 10:00:00", 1, "click", 10.0),
            (2, "2024-01-01 10:01:00", 1, "view", 3.0),
            (3, "2024-01-01 10:02:00", 1, "purchase", 11.0),  # > 10 ✓
            (4, "2024-01-01 10:03:00", 1, "click", 50.0),
            (5, "2024-01-01 10:04:00", 1, "view", 3.0),
            (6, "2024-01-01 10:05:00", 1, "purchase", 20.0)]  # < 50 ✗
    df = _events(spark, rows)
    out = _run(spark, df, """
        SELECT user_id, a_val, c_val
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.value) AS a_val, LAST(C.value) AS c_val
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B C)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'view',
                 C AS event_type = 'purchase' AND C.value > A.value
        )""").collect()
    assert [(r.user_id, r.a_val, r.c_val) for r in out] == [(1, 10.0, 11.0)]


def test_prev_physical_ascending_run(spark):
    """U AS U.value > PREV(U.value): three consecutive ascending steps
    — PREV navigates PHYSICAL partition rows (here contiguity is strict
    so physical prev == the previously consumed row)."""
    rows = [(1, "2024-01-01 10:00:00", 1, "x", 5.0),
            (2, "2024-01-01 10:01:00", 1, "x", 6.0),
            (3, "2024-01-01 10:02:00", 1, "x", 7.0),
            (4, "2024-01-01 10:03:00", 1, "x", 8.0),   # S=1 U=2,3,4 ✓
            (5, "2024-01-01 10:04:00", 1, "x", 2.0),   # breaks the run
            (6, "2024-01-01 10:05:00", 1, "x", 3.0)]
    df = _events(spark, rows)
    out = _run(spark, df, """
        SELECT user_id, s_val, u_last
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(S.value) AS s_val, LAST(U.value) AS u_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S U{3})
          DEFINE S AS TRUE,
                 U AS U.value > PREV(U.value)
        )""").orderBy("s_val").collect()
    assert [(r.user_id, r.s_val, r.u_last) for r in out] == [(1, 5.0, 8.0)]


def test_own_variable_last_offset_descending(spark):
    """Flink's canonical shape: LAST(D.value, 1) IS NULL OR D.value <
    LAST(D.value, 1) — each D must be below the previous D."""
    rows = [(1, "2024-01-01 10:00:00", 1, "start", 100.0),
            (2, "2024-01-01 10:01:00", 1, "x", 90.0),
            (3, "2024-01-01 10:02:00", 1, "x", 80.0),
            (4, "2024-01-01 10:03:00", 1, "x", 85.0),   # not < 80 -> kills
            (5, "2024-01-01 10:04:00", 1, "start", 50.0),
            (6, "2024-01-01 10:05:00", 1, "x", 40.0),
            (7, "2024-01-01 10:06:00", 1, "x", 30.0)]
    df = _events(spark, rows)
    out = _run(spark, df, """
        SELECT user_id, strt, d_last
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(STRT.value) AS strt, LAST(D.value) AS d_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT D{2})
          DEFINE STRT AS event_type = 'start',
                 D AS event_type = 'x' AND (LAST(D.value, 1) IS NULL
                      OR D.value < LAST(D.value, 1))
        )""").orderBy("strt").collect()
    assert [(r.user_id, r.strt, r.d_last) for r in out] == [
        (1, 50.0, 30.0), (1, 100.0, 80.0)]


def test_prev_rows_survive_microbatches(spark):
    """PREV navigates PHYSICAL rows across micro-batch boundaries: the
    last-rows buffer must round-trip through the state store so an
    ascending step spanning two batches still matches."""
    import tempfile

    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    rows = [(1, "2024-01-01 10:00:00", 1, "x", 5.0),
            (2, "2024-01-01 10:01:00", 1, "x", 6.0),
            (3, "2024-01-01 10:02:00", 1, "x", 7.0),
            (4, "2024-01-01 10:03:00", 1, "x", 8.0)]
    df = _events(spark, rows)
    src = tempfile.mkdtemp(prefix="mrnav_prev_mb_")
    for i, _ in enumerate(rows):
        df.filter(F.col("event_id") == i + 1).coalesce(1) \
          .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = execute_match_recognize_sql(spark, """
        SELECT user_id, s_val, u_last
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(S.value) AS s_val, LAST(U.value) AS u_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S U{3})
          DEFINE S AS TRUE,
                 U AS U.value > PREV(U.value)
        )""", batch_df=df, stream_df=stream).collect()
    assert [(r.user_id, r.s_val, r.u_last) for r in out] == [(1, 5.0, 8.0)]


def test_nav_state_survives_microbatches(spark):
    """The per-run match buffer round-trips through the state store:
    feed the same pattern through MULTIPLE micro-batches (one file per
    event) and require the identical match set."""
    import tempfile

    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    rows = [(1, "2024-01-01 10:00:00", 1, "click", 10.0),
            (2, "2024-01-01 10:01:00", 1, "view", 15.0),
            (3, "2024-01-01 10:02:00", 1, "view", 20.0),
            (4, "2024-01-01 10:03:00", 1, "purchase", 12.0)]
    df = _events(spark, rows)
    src = tempfile.mkdtemp(prefix="mrnav_mb_")
    # one parquet file per event => maxFilesPerTrigger=1 gives one
    # micro-batch per event, forcing nav state through serialization
    for i, _ in enumerate(rows):
        df.filter(F.col("event_id") == i + 1).coalesce(1) \
          .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = execute_match_recognize_sql(spark, """
        SELECT user_id, a_val, b_last, c_val
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.value) AS a_val, LAST(B.value) AS b_last,
                   LAST(C.value) AS c_val
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B{2} C)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'view' AND B.value > LAST(A.value),
                 C AS event_type = 'purchase' AND C.value < FIRST(B.value)
        )""", batch_df=df, stream_df=stream).collect()
    assert [(r.user_id, r.a_val, r.b_last, r.c_val) for r in out] == [
        (1, 10.0, 20.0, 12.0)]


def test_define_clause_order_independent_of_pattern_order(spark):
    """DEFINE may list its conditions in any order; measures and
    CLASSIFIER must follow PATTERN order (review r6: stage names were
    taken from the DEFINE dict, mis-attributing variables)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 10.0),
        (2, "2024-01-01 10:01:00", 1, "view", 20.0),
        (3, "2024-01-01 10:02:00", 1, "click", 30.0),
        (4, "2024-01-01 10:03:00", 1, "view", 40.0),
    ]
    df = _events(spark, rows)
    # B defined BEFORE A, while PATTERN is (A B)
    out = _run(spark, df, """
SELECT user_id, a_val, b_val
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES LAST(A.value) AS a_val, LAST(B.value) AS b_val
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B)
  DEFINE B AS event_type = 'view',
         A AS event_type = 'click'
) AS m
""").collect()
    got = sorted((r.a_val, r.b_val) for r in out)
    assert got == [(10.0, 20.0), (30.0, 40.0)]


def test_mr_keyword_in_block_comment_not_routed(spark):
    from flink_release_1_10_0_spark.sql_match import has_match_recognize

    assert not has_match_recognize(
        "SELECT a FROM t /* note: FROM t MATCH_RECOGNIZE ( ... ) */ "
        "WHERE a > 0")
    assert has_match_recognize(
        "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts "
        "MEASURES 1 AS one ONE ROW PER MATCH PATTERN (A) "
        "DEFINE A AS TRUE) AS m")


def test_composite_partition_by_two_columns(spark):
    """PARTITION BY user_id, event_type: the threshold-crossing pair
    must be consecutive WITHIN its (user, type) partition — a crossing
    that only exists when the two types are interleaved must not
    match."""
    rows = [
        # user 1, type 'a': 40 -> 60 consecutive in-partition: match
        (1, "2024-01-01 10:00:00", 1, "a", 40.0),
        (2, "2024-01-01 10:01:00", 1, "b", 45.0),   # interleaved, other part.
        (3, "2024-01-01 10:02:00", 1, "a", 60.0),
        # user 1, type 'b': 45 -> 30: no crossing
        (4, "2024-01-01 10:03:00", 1, "b", 30.0),
        # user 2, type 'a': single row, no pair
        (5, "2024-01-01 10:04:00", 2, "a", 10.0),
    ]
    df = _events(spark, rows)
    out = _run(spark, df, """
SELECT user_id, event_type, start_id, end_id
FROM ev MATCH_RECOGNIZE (
  PARTITION BY user_id, event_type
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS A.value < 50,
         B AS B.value >= 50
) AS m
""").collect()
    assert [(r.user_id, r.event_type, r.start_id, r.end_id)
            for r in out] == [(1, "a", 1, 3)]


def test_order_by_tiebreaker_changes_processing_order(spark):
    """Two events share a timestamp; ORDER BY ts, value puts the lower
    value first, so the strict A-then-B pair matches — ordering by
    (ts, event_id) alone would see B before A and find nothing."""
    rows = [(2, "2024-01-01 10:00:00", 1, "a", 1.0),
            (1, "2024-01-01 10:00:00", 1, "b", 2.0)]
    df = _events(spark, rows)
    sql = """
SELECT user_id, start_id, end_id
FROM ev MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts{TB}
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS event_type = 'a',
         B AS event_type = 'b'
) AS m
"""
    with_tb = _run(spark, df, sql.replace("{TB}", ", value")).collect()
    assert [(r.start_id, r.end_id) for r in with_tb] == [(2, 1)]
    without = _run(spark, df, sql.replace("{TB}", "")).collect()
    assert without == []


def test_order_by_desc_event_time_rejected(spark):
    """Only the FIRST operand (the rowtime) refuses DESC; tiebreakers
    accept arbitrary collations (StreamExecMatch.scala:69)."""
    import pytest

    from flink_release_1_10_0_spark.sql_match import parse_match_recognize

    with pytest.raises(NotImplementedError, match="descending event time"):
        parse_match_recognize("""
SELECT * FROM t MATCH_RECOGNIZE (
  PARTITION BY k ORDER BY ts DESC MEASURES 1 AS one ONE ROW PER MATCH
  PATTERN (A) DEFINE A AS TRUE) AS m""")
    spec = parse_match_recognize("""
SELECT * FROM t MATCH_RECOGNIZE (
  PARTITION BY k ORDER BY ts, priority DESC, value * -1
  MEASURES 1 AS one ONE ROW PER MATCH
  PATTERN (A) DEFINE A AS TRUE) AS m""")
    assert spec.order_by == ["ts", "priority DESC", "value * -1"]


def test_order_by_desc_tiebreaker_and_expression(spark):
    """ORDER BY ts, value DESC: two same-timestamp events process in
    descending value order, flipping which strict pair matches; an
    expression operand (value * -1 ascending) is the same collation."""
    rows = [(1, "2024-01-01 10:00:00", 1, "a", 1.0),
            (2, "2024-01-01 10:00:00", 1, "b", 2.0),
            (3, "2024-01-01 10:05:00", 1, "a", 9.0),
            (4, "2024-01-01 10:05:00", 1, "b", 5.0)]
    df = _events(spark, rows)
    sql = """
SELECT user_id, start_id, end_id
FROM ev MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, {TB}
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS event_type = 'a',
         B AS event_type = 'b'
) AS m
"""
    # SQL row-pattern matching is over CONSECUTIVE rows, so the
    # collation decides adjacency.  Ascending value: row order is
    # (a1, b2, b4, a3) — only (a1, b2) is A-then-B adjacent.
    # Descending: (b2, a1, a3, b4) — a1's next row is a3 (dies), a3's
    # is b4, so only (a3, b4) matches.
    asc = sorted((r.start_id, r.end_id)
                 for r in _run(spark, df, sql.replace("{TB}", "value"))
                 .collect())
    desc = sorted((r.start_id, r.end_id)
                  for r in _run(spark, df, sql.replace("{TB}", "value DESC"))
                  .collect())
    expr = sorted((r.start_id, r.end_id)
                  for r in _run(spark, df,
                                sql.replace("{TB}", "value * -1")).collect())
    assert desc == expr            # same collation, two spellings
    assert asc != desc             # the collation really changes matches
    assert desc == [(3, 4)]
    assert asc == [(1, 2)]


def test_qualified_prev_over_other_variable_rejected():
    import pytest

    from flink_release_1_10_0_spark.streaming.navexpr import (
        compile_nav_predicate)

    with pytest.raises(NotImplementedError, match="qualified PREV"):
        compile_nav_predicate("B.value > PREV(A.value)", "B", ["A", "B"])
    # own-variable qualified PREV stays allowed (same as bare PREV)
    compile_nav_predicate("B.value > PREV(B.value)", "B", ["A", "B"])


def test_arith_non_numeric_operands_yield_null():
    from flink_release_1_10_0_spark.streaming.navexpr import (
        compile_nav_predicate)

    # 'x' + 'y' would concatenate under Python semantics; the guard
    # makes the arithmetic NULL, so the predicate is not satisfied
    p = compile_nav_predicate("value + 1 > 0 AND PREV(value) IS NULL",
                              "A", ["A"])
    assert p.fn({"value": "xyz"}, {}, {}, []) is not True
    assert p.fn({"value": 5.0}, {}, {}, []) is True


def test_measure_compound_expression_compiles():
    from flink_release_1_10_0_spark.streaming.cep import _measure_sql_any

    sql = _measure_sql_any("ROUND(LAST(B.value) - FIRST(A.value), 6)",
                           valid_vars=["A", "B"])
    assert "max_by(value, pos) FILTER (WHERE var = 'B')" in sql
    assert "min_by(value, pos) FILTER (WHERE var = 'A')" in sql
    assert sql.startswith("ROUND((") and sql.endswith(", 6)")
    # single-aggregate fast path unchanged
    assert _measure_sql_any("COUNT(A.*)") == \
        "count(*) FILTER (WHERE var = 'A')"
    import pytest
    with pytest.raises(ValueError, match="not a pattern variable"):
        _measure_sql_any("LAST(Z.value) + 1", valid_vars=["A", "B"])
    with pytest.raises(ValueError, match="bad MEASURES"):
        _measure_sql_any("1 + 2")


def test_sql_reluctant_trailing_quantifier_rejected():
    import pytest

    from flink_release_1_10_0_spark.streaming.cep import (
        compile_match_pattern)

    with pytest.raises(NotImplementedError, match="reluctant"):
        compile_match_pattern("A B+?", {"A": "true", "B": "true"})
    with pytest.raises(NotImplementedError, match="reluctant"):
        compile_match_pattern("A B??", {"A": "true", "B": "true"})
    # mid-pattern reluctant stays supported
    stages = compile_match_pattern("A B*? C", {"A": "true", "B": "true",
                                               "C": "true"})
    assert [s.greedy for s in stages] == [False, False, False]


def test_measure_nav_offset_compiles():
    import pytest

    from flink_release_1_10_0_spark.streaming.cep import (
        _measure_sql, _parse_measure)

    assert _parse_measure("LAST(B.value, 2)") == \
        ("FINAL", "LAST", "B", "value", 2)
    assert _parse_measure("RUNNING FIRST(A.v, 1)") == \
        ("RUNNING", "FIRST", "A", "v", 1)
    sql = _measure_sql("LAST(B.value, 1)")
    assert "try_element_at" in sql and sql.endswith("-2).v")
    sql_f = _measure_sql("FIRST(B.value, 1)")
    assert sql_f.endswith("2).v") and "-2" not in sql_f
    # zero offset keeps the min_by/max_by fast path (oracle hashes
    # of every pre-existing query unchanged)
    assert _measure_sql("LAST(B.value)") == \
        "max_by(value, pos) FILTER (WHERE var = 'B')"
    with pytest.raises(ValueError, match="only valid on FIRST/LAST"):
        _parse_measure("AVG(B.value, 1)")


def test_measure_window_nav_offset(spark):
    """ALL ROWS PER MATCH offset navigation: per-row FINAL frame over a
    two-B match yields the first B for LAST(col, 1) on every row and
    NULL for an out-of-range offset."""
    from pyspark.sql import Window

    from flink_release_1_10_0_spark.streaming.cep import _measure_window

    rows = [(1, 1, 0, "A", 10.0), (1, 1, 1, "B", 60.0),
            (1, 1, 2, "B", 70.0)]
    df = spark.createDataFrame(
        rows, "user_id int, match_no int, pos int, var string, value double")
    wm = Window.partitionBy("user_id", "match_no")
    wr = (Window.partitionBy("user_id", "match_no").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.select(
        "pos",
        _measure_window("LAST(B.value, 1)", wm, wr).alias("b_prev"),
        _measure_window("LAST(B.value, 9)", wm, wr).alias("b_oob"),
        _measure_window("RUNNING LAST(B.value, 1)", wm, wr).alias("run"),
    ).orderBy("pos").collect()
    assert [r.b_prev for r in out] == [60.0, 60.0, 60.0]
    assert [r.b_oob for r in out] == [None, None, None]
    # RUNNING: prefix frame — no second B until pos 2
    assert [r.run for r in out] == [None, None, 60.0]


def test_subset_rejections():
    """SUBSET is a MEASURES surface: DEFINE references and skip-to
    targets naming a subset refuse loudly; members must be DEFINEd."""
    import pytest

    from flink_release_1_10_0_spark.sql_match import parse_match_recognize

    base = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      MEASURES SUM(S.value) AS s
      ONE ROW PER MATCH
      {after}
      PATTERN (A B)
      SUBSET S = ({members})
      DEFINE A AS event_type = 'click', B AS {bdef}
    ) AS m
    """
    ok = parse_match_recognize(base.format(
        after="AFTER MATCH SKIP TO NEXT ROW", members="A, B",
        bdef="event_type = 'view'"))
    assert ok.subsets == {"S": ["A", "B"]}

    with pytest.raises(ValueError, match="no DEFINE"):
        parse_match_recognize(base.format(
            after="AFTER MATCH SKIP TO NEXT ROW", members="A, Z",
            bdef="event_type = 'view'"))
    with pytest.raises(NotImplementedError, match="MEASURES surface"):
        parse_match_recognize(base.format(
            after="AFTER MATCH SKIP TO NEXT ROW", members="A, B",
            bdef="B.value > S.value"))
    with pytest.raises(NotImplementedError, match="skip"):
        parse_match_recognize(base.format(
            after="AFTER MATCH SKIP TO LAST S", members="A, B",
            bdef="event_type = 'view'"))


def test_sql_surface_skip_to_var_keeps_case(spark):
    """Regression: `AFTER MATCH SKIP TO LAST A` through the SQL text
    must keep the variable's case (the parser used to lowercase it,
    so the skip target missed every stage) — the SQL-surface result
    equals the programmatic facade's."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)
    from flink_release_1_10_0_spark.streaming.cep import (
        match_recognize_pattern)
    from flink_release_1_10_0_spark.streaming.core import (
        read_stream_table, run_to_completion)

    sf = "/root/testdata/sf0.001"
    sql = """
    SELECT user_id, start_id, end_id
    FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts
      MEASURES FIRST(A.event_id) AS start_id, LAST(C.event_id) AS end_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP TO LAST A
      PATTERN (A+ C)
      DEFINE A AS event_type = 'click',
             C AS event_type = 'purchase'
    ) AS m
    """
    got = execute_match_recognize_sql(
        spark, sql, batch_df=t(spark, sf, "events"),
        stream_df=read_stream_table(spark, sf, "events"))
    want = run_to_completion(
        match_recognize_pattern(
            read_stream_table(spark, sf, "events"), "user_id",
            define={"A": "event_type = 'click'",
                    "C": "event_type = 'purchase'"},
            pattern="A+ C", after_match="skip_to_last A")
        .select("user_id", "start_id", "end_id"), "append")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_trailing_plus_tail_match_emits_at_table_end(spark):
    """PATTERN (A B+) with the match ending on the table's last row:
    SQL:2016 batch semantics return the maximal match — the bounded
    replay's EOS sentinel (the final +inf watermark of a bounded job)
    flushes it instead of silently dropping it.  The mid-table match
    (closed by a foreign row) must still emit exactly once."""
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    rows = [(1, "2024-01-01 10:00:00", 1, "click", 1.0),
            (2, "2024-01-01 10:01:00", 1, "view", 2.0),
            (3, "2024-01-01 10:02:00", 1, "other", 0.0),  # closes match 1
            (4, "2024-01-01 10:03:00", 1, "click", 3.0),
            (5, "2024-01-01 10:04:00", 1, "view", 4.0),
            (6, "2024-01-01 10:05:00", 1, "view", 5.0)]   # table ends mid-run
    df = _events(spark, rows)
    out = execute_match_recognize_sql(spark, """
        SELECT user_id, a_id, n_b, b_last
        FROM ev MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.event_id) AS a_id, COUNT(B.*) AS n_b,
                   LAST(B.value) AS b_last
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'view'
        )""", batch_df=df).collect()
    got = sorted((r.a_id, r.n_b, r.b_last) for r in out)
    assert got == [(1, 1, 2.0), (4, 2, 5.0)]
