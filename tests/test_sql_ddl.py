"""Flink 1.10 SQL DDL surface (sql_ddl.py): CREATE TABLE ... WITH,
INSERT INTO/OVERWRITE, DROP TABLE, WATERMARK FOR as_stream."""

from __future__ import annotations

import tempfile

import pytest

from flink_release_1_10_0_spark.environment import TableEnvironment
from flink_release_1_10_0_spark.sql_ddl import parse_create_table


def test_parse_create_table_types_and_watermark():
    t = parse_create_table("""
        CREATE TABLE ev (
            event_id BIGINT,
            name VARCHAR(32),
            score DECIMAL(10,2),
            tags ARRAY<STRING>,
            ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH (
            'connector.type' = 'filesystem',
            'connector.path' = '/tmp/ev',
            'format.type' = 'json'
        )
    """)
    assert t.schema == ("event_id bigint, name string, score decimal(10,2), "
                        "tags array<string>, ts timestamp")
    assert t.fmt == "json" and t.path == "/tmp/ev"
    assert t.watermark_col == "ts" and t.watermark_delay == "5 seconds"


def test_parse_rejects_non_filesystem():
    with pytest.raises(NotImplementedError):
        parse_create_table("""
            CREATE TABLE k (a INT) WITH (
                'connector.type' = 'jdbc', 'connector.path' = 'x')
        """)


def test_ddl_create_insert_select_roundtrip(spark):
    env = TableEnvironment(spark)
    base = tempfile.mkdtemp(prefix="ddl_rt_")
    env.sql_update(f"""
        CREATE TABLE sales_csv (
            id BIGINT, seg STRING, amount DOUBLE
        ) WITH (
            'connector.type' = 'filesystem',
            'connector.path' = '{base}/sales',
            'format.type' = 'csv',
            'format.write-header' = 'true'
        )
    """)
    spark.createDataFrame(
        [(1, "A", 10.5), (2, "B", 20.0), (3, "A", 4.5)],
        "id bigint, seg string, amount double").createOrReplaceTempView("_src")
    env.sql_update("INSERT INTO sales_csv SELECT id, seg, amount FROM _src")
    got = {(r.seg): r.total for r in spark.sql(
        "SELECT seg, CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total FROM sales_csv GROUP BY seg").collect()}
    assert got == {"A": 15.0, "B": 20.0}
    # append semantics: second INSERT INTO doubles the totals
    env.sql_update("INSERT INTO sales_csv SELECT id, seg, amount FROM _src")
    n = spark.sql("SELECT COUNT(*) AS n FROM sales_csv").collect()[0].n
    assert n == 6
    # INSERT OVERWRITE resets
    env.sql_update("INSERT OVERWRITE sales_csv SELECT id, seg, amount FROM _src")
    n = spark.sql("SELECT COUNT(*) AS n FROM sales_csv").collect()[0].n
    assert n == 3
    env.sql_update("DROP TABLE sales_csv")
    assert "sales_csv" not in [t.name for t in spark.catalog.listTables()]


def test_ddl_watermark_stream(spark):
    env = TableEnvironment(spark)
    base = tempfile.mkdtemp(prefix="ddl_wm_")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")],
        "id bigint, ts string").selectExpr(
        "id", "cast(ts as timestamp) ts").write.json(f"{base}/ev")
    env.sql_update(f"""
        CREATE TABLE ev_json (
            id BIGINT, ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
        ) WITH (
            'connector.type' = 'filesystem',
            'connector.path' = '{base}/ev',
            'format.type' = 'json'
        )
    """)
    sdf = env.ddl_catalog.as_stream("ev_json")
    assert sdf.isStreaming
    # the watermark node is in the logical plan
    assert "EventTimeWatermark" in sdf._jdf.queryExecution().logical().toString()


def test_ddl_create_drop_view(spark):
    env = TableEnvironment(spark)
    spark.createDataFrame([(1, 5.0), (2, 7.0)], "id bigint, v double") \
         .createOrReplaceTempView("_vsrc")
    env.sql_update("CREATE VIEW v_doubled AS SELECT id, v * 2 AS v2 FROM _vsrc")
    got = sorted((r.id, r.v2) for r in spark.sql("SELECT * FROM v_doubled").collect())
    assert got == [(1, 10.0), (2, 14.0)]
    env.sql_update("DROP VIEW v_doubled")
    assert "v_doubled" not in [t.name for t in spark.catalog.listTables()]


def test_list_tables_and_scan(spark):
    """TableEnvironment.listTables (TableEnvironment.java:376) + scan."""
    from flink_release_1_10_0_spark.environment import TableEnvironment

    tenv = TableEnvironment.create(spark)
    df = spark.range(3).withColumnRenamed("id", "k")
    tenv.register_table("lt_demo_table", df)
    assert "lt_demo_table" in tenv.list_tables()
    assert tenv.scan("lt_demo_table").df.count() == 3
