"""FOR SYSTEM_TIME AS OF / LATERAL TABLE temporal-join SQL front end
(sql_temporal.py): oracle parity, the broadcast-lookup plan, and the
reference's refusal surface (CommonLookupJoinRule.scala:52-70,
docs/dev/table/streaming/joins.md:330)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.sql_temporal import (
    LookupSource, TemporalTableFunction, execute_system_time_join_sql,
    execute_temporal_function_sql)
from tests.conftest import SF_DIR, compare_query


@pytest.mark.parametrize("name", [
    "flink_sql_system_time_lookup",
    "flink_sql_system_time_left",
    "flink_sql_temporal_table_function",
])
def test_temporal_sql_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def _dim(spark):
    return spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 10, 5.0)],
        "k int, vt int, rate double")


def _probe(spark):
    return (spark.createDataFrame([(1, 100.0), (2, 7.0), (3, 1.0)],
                                  "k int, amount double")
            .withColumn("proctime", F.current_timestamp()))


def test_lookup_snapshot_picks_latest_version(spark):
    sql = ("SELECT o.k AS k, r.rate AS rate FROM probe AS o "
           "JOIN dim FOR SYSTEM_TIME AS OF o.proctime AS r ON o.k = r.k")
    out = execute_system_time_join_sql(
        spark, sql, tables={"probe": _probe(spark)},
        lookup_sources={"dim": LookupSource(_dim(spark), "k", ("vt",))},
        proctime_attrs={"o": "proctime"})
    rows = {(r.k, r.rate) for r in out.collect()}
    # k=1 takes the vt=20 version; k=3 has no dim row (inner drops it)
    assert rows == {(1, 2.0), (2, 5.0)}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_lookup_left_join_keeps_unmatched(spark):
    sql = ("SELECT o.k AS k, r.rate AS rate FROM probe AS o "
           "LEFT JOIN dim FOR SYSTEM_TIME AS OF o.proctime AS r ON o.k = r.k")
    out = execute_system_time_join_sql(
        spark, sql, tables={"probe": _probe(spark)},
        lookup_sources={"dim": LookupSource(_dim(spark), "k", ("vt",))},
        proctime_attrs={"o": "proctime"})
    rows = {(r.k, r.rate) for r in out.collect()}
    assert rows == {(1, 2.0), (2, 5.0), (3, None)}


def test_lookup_refuses_right_and_full_join(spark):
    for jt in ("RIGHT", "FULL"):
        sql = (f"SELECT o.k FROM probe AS o {jt} JOIN dim "
               "FOR SYSTEM_TIME AS OF o.proctime AS r ON o.k = r.k")
        with pytest.raises(NotImplementedError, match="INNER and LEFT"):
            execute_system_time_join_sql(
                spark, sql, tables={"probe": _probe(spark)},
                lookup_sources={"dim": LookupSource(_dim(spark), "k")},
                proctime_attrs={"o": "proctime"})


def test_lookup_refuses_non_proctime_attribute(spark):
    # CommonLookupJoinRule.scala:60 — rowtime AS OF must refuse
    sql = ("SELECT o.k FROM probe AS o JOIN dim "
           "FOR SYSTEM_TIME AS OF o.rowtime AS r ON o.k = r.k")
    with pytest.raises(NotImplementedError, match="proctime"):
        execute_system_time_join_sql(
            spark, sql, tables={"probe": _probe(spark)},
            lookup_sources={"dim": LookupSource(_dim(spark), "k")},
            proctime_attrs={"o": "proctime"})


def test_lookup_refuses_non_lookup_source(spark):
    # CommonLookupJoinRule.scala:52 — build side must be lookupable
    sql = ("SELECT o.k FROM probe AS o JOIN other "
           "FOR SYSTEM_TIME AS OF o.proctime AS r ON o.k = r.k")
    with pytest.raises(NotImplementedError, match="LookupableTableSource"):
        execute_system_time_join_sql(
            spark, sql, tables={"probe": _probe(spark)},
            lookup_sources={"dim": LookupSource(_dim(spark), "k")},
            proctime_attrs={"o": "proctime"})


def test_temporal_fn_event_time_versions(spark):
    probe = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 100.0), (1, 25, 100.0), (2, 15, 1.0)],
        "k int, t int, amount double")
    versions = spark.createDataFrame(
        [(1, 10, 1.5), (1, 20, 2.5)], "k int, vt int, rate double")
    sql = ("SELECT o.k AS k, o.t AS t, r.rate AS rate "
           "FROM probe AS o, LATERAL TABLE (rates(o.t)) AS r "
           "WHERE o.k = r.k")
    out = execute_temporal_function_sql(
        spark, sql, tables={"probe": probe},
        temporal_functions={"rates": TemporalTableFunction(
            versions, time_attr="vt", primary_key="k")})
    rows = {(r.k, r.t, r.rate) for r in out.collect()}
    # t=5 precedes every version -> dropped (inner, joins.md:146);
    # t=15 sees the vt=10 version, t=25 the vt=20 one; k=2 has no versions
    assert rows == {(1, 15, 1.5), (1, 25, 2.5)}


def test_temporal_fn_requires_key_equality_in_where(spark):
    probe = spark.createDataFrame([(1, 5, 1.0)], "k int, t int, amount double")
    versions = spark.createDataFrame([(1, 1, 1.0)], "k int, vt int, rate double")
    base = {"tables": {"probe": probe},
            "temporal_functions": {"rates": TemporalTableFunction(
                versions, time_attr="vt", primary_key="k")}}
    with pytest.raises(NotImplementedError, match="WHERE"):
        execute_temporal_function_sql(
            spark, "SELECT o.k FROM probe AS o, LATERAL TABLE (rates(o.t)) AS r",
            **base)
    with pytest.raises(NotImplementedError, match="primary.key|primary-key"):
        execute_temporal_function_sql(
            spark, ("SELECT o.k FROM probe AS o, LATERAL TABLE (rates(o.t)) AS r "
                    "WHERE o.amount > 0"), **base)


def test_tenv_sql_query_routes_system_time(spark):
    """TableEnvironment.sql_query accepts the docs' FOR SYSTEM_TIME form
    end to end (joins.md:299-342 through one SQL entry point)."""
    from flink_release_1_10_0_spark.environment import TableEnvironment

    tenv = TableEnvironment.create(spark)
    tenv.register_table("probe_st", _probe(spark))
    tenv.register_lookup_source("dim_st", _dim(spark), primary_key="k",
                                version_cols=("vt",))
    tenv.register_proctime_attribute("probe_st", "proctime")
    out = tenv.sql_query(
        "SELECT o.k AS k, r.rate AS rate FROM probe_st AS o "
        "JOIN dim_st FOR SYSTEM_TIME AS OF o.proctime AS r ON o.k = r.k")
    assert {(r.k, r.rate) for r in out.df.collect()} == {(1, 2.0), (2, 5.0)}


def test_tenv_sql_query_routes_lateral_temporal_fn(spark):
    """tEnv.registerFunction('Rates', rates) + LATERAL TABLE through
    sql_query (joins.md:139-171)."""
    from flink_release_1_10_0_spark.environment import Table, TableEnvironment

    tenv = TableEnvironment.create(spark)
    probe = spark.createDataFrame(
        [(1, 15, 2.0), (1, 25, 3.0)], "k int, t int, amount double")
    versions = spark.createDataFrame(
        [(1, 10, 1.5), (1, 20, 2.5)], "k int, vt int, rate double")
    tenv.register_table("orders_lt", probe)
    rates = Table(versions).create_temporal_table_function("vt", "k")
    tenv.register_temporal_table_function("rates_lt", rates)
    out = tenv.sql_query(
        "SELECT o.t AS t, r.rate AS rate "
        "FROM orders_lt AS o, LATERAL TABLE (rates_lt(o.t)) AS r "
        "WHERE o.k = r.k")
    assert {(r.t, r.rate) for r in out.df.collect()} == {(15, 1.5), (25, 2.5)}
