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
