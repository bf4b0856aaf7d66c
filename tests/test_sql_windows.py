"""Flink group-window SQL rewrite (sql_windows.py)."""

from __future__ import annotations

from flink_release_1_10_0_spark.sql_windows import rewrite_group_windows


def test_rewrite_tumble_and_selectors():
    got = rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS s, "
        "TUMBLE_END(ts, INTERVAL '1' HOUR) AS e, COUNT(*) n "
        "FROM ev GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)")
    assert "window(ts, '1 hours').start AS s" in got
    assert "window(ts, '1 hours').end AS e" in got
    assert "GROUP BY window(ts, '1 hours')" in got


def test_rewrite_hop_swaps_slide_and_size():
    # Flink HOP(ts, slide, size) -> Spark window(ts, size, slide)
    got = rewrite_group_windows(
        "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)")
    assert got == "GROUP BY window(ts, '1 hours', '30 minutes')"


def test_rewrite_session():
    got = rewrite_group_windows(
        "GROUP BY SESSION(ts, INTERVAL '30' MINUTE)")
    assert got == "GROUP BY session_window(ts, '30 minutes')"


def test_rewrite_leaves_plain_sql_alone():
    sql = "SELECT a, COUNT(*) FROM t GROUP BY a"
    assert rewrite_group_windows(sql) == sql


def test_clause_keywords_ignore_underscore_identifiers():
    """A column named url_pattern / x_define inside MEASURES or DEFINE
    must not be mis-detected as a top-level clause keyword (ADVICE r5:
    '_' is a word character in the boundary check)."""
    from flink_release_1_10_0_spark.sql_match import parse_match_recognize

    spec = parse_match_recognize("""
        SELECT * FROM t MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES FIRST(A.url_pattern) AS url_pattern,
                   LAST(B.x_define) AS x_define
          ONE ROW PER MATCH
          PATTERN (A B)
          DEFINE A AS url_pattern = 'x',
                 B AS x_define > 0)""")
    assert spec.measures == {"url_pattern": "FIRST(A.url_pattern)",
                             "x_define": "LAST(B.x_define)"}
    assert spec.define == {"A": "url_pattern = 'x'", "B": "x_define > 0"}


def test_match_recognize_routing_ignores_literals_and_comments(spark):
    """MATCH_RECOGNIZE inside a string literal or -- comment must NOT
    route the statement to the MR executor (ADVICE r5)."""
    from flink_release_1_10_0_spark.environment import TableEnvironment
    from flink_release_1_10_0_spark.sql_match import has_match_recognize

    assert not has_match_recognize(
        "SELECT 'FROM x MATCH_RECOGNIZE (' AS s FROM t")
    assert not has_match_recognize(
        "SELECT a FROM t -- FROM t MATCH_RECOGNIZE (todo)\nWHERE a > 0")
    assert has_match_recognize(
        "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts "
        "PATTERN (A) DEFINE A AS x > 0)")

    env = TableEnvironment(spark)
    out = env.sql_query(
        "SELECT 'no FROM x MATCH_RECOGNIZE ( here' AS s").df.collect()
    assert out[0].s == "no FROM x MATCH_RECOGNIZE ( here"


def test_hop_sql_matches_dataframe_window(spark):
    """HOP SQL through the rewrite equals the native window() result."""
    from pyspark.sql import functions as F
    from flink_release_1_10_0_spark.environment import TableEnvironment
    env = TableEnvironment(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.createOrReplaceTempView("_hop_ev")
    sql_rows = env.sql_query("""
        SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS ws,
               COUNT(*) AS n
        FROM _hop_ev GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)
    """).df.collect()
    df_rows = (ev.groupBy(F.window("ts", "1 hours", "30 minutes"))
               .agg(F.count(F.lit(1)).alias("n"))
               .select(F.col("window.start").alias("ws"), "n").collect())
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_match_recognize_sql_through_table_environment(spark):
    """The raw MATCH_RECOGNIZE clause runs through sql_query: pattern
    A B C over registered rows, outer projection applied around the
    excised clause."""
    from pyspark.sql import functions as F

    from flink_release_1_10_0_spark.environment import TableEnvironment

    rows = [(1, "2024-01-01 10:00:00", 1, "click", 5.0),
            (2, "2024-01-01 10:01:00", 1, "view", 1.0),
            (3, "2024-01-01 10:02:00", 1, "purchase", 20.0),
            (4, "2024-01-01 10:03:00", 1, "click", 7.0)]
    df = (spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double")
        .withColumn("ts", F.col("ts").cast("timestamp")))
    df.createOrReplaceTempView("mr_events")
    env = TableEnvironment(spark)
    out = env.sql_query("""
        SELECT user_id, a_val, c_val
        FROM mr_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.value) AS a_val, LAST(C.value) AS c_val
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B C)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'view',
                 C AS event_type = 'purchase'
        ) WHERE a_val > 0
    """).df.collect()
    assert [(r.user_id, r.a_val, r.c_val) for r in out] == [(1, 5.0, 20.0)]


def test_match_recognize_sql_narrowings_raise():
    """Documented narrowings fail loudly: NEXT in DEFINE and
    ORDER BY ... DESC.  Composite PARTITION BY and cross-variable
    LAST/FIRST/PREV navigation are SUPPORTED."""
    import pytest

    from flink_release_1_10_0_spark.sql_match import (
        MatchSpec, _compile_define, parse_match_recognize)

    # composite PARTITION BY + ORDER BY tiebreakers now parse
    q = """SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k, k2 ORDER BY ts, event_id
        PATTERN (A) DEFINE A AS x > 0)"""
    spec0 = parse_match_recognize(q)
    assert spec0.partition_by == ["k", "k2"]
    assert spec0.order_by == ["ts", "event_id"]

    q_desc = """SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY ts DESC
        PATTERN (A) DEFINE A AS x > 0)"""
    with pytest.raises(NotImplementedError):
        parse_match_recognize(q_desc)

    spec = MatchSpec(table="t", partition_by=["k"], order_by=["ts"],
                     define={"A": "x > 0", "B": "value > NEXT(A.value)"},
                     pattern="A B")
    with pytest.raises(NotImplementedError):
        _compile_define(spec)

    # cross-variable navigation compiles to the nav tier
    spec2 = MatchSpec(table="t", partition_by=["k"], order_by=["ts"],
                      define={"A": "x > 0", "B": "value > LAST(A.value)"},
                      pattern="A B")
    sql_define, nav = _compile_define(spec2)
    assert sql_define == {"A": "x > 0", "B": "true"}
    assert set(nav) == {"B"} and nav["B"].tracked == {"A": {"value": [0, 1]}}
