"""Relational operator coverage (SURVEY.md §2.2/§2.3/§2.4/§2.6/§2.7/§2.8).

Each query exercises one reference operator family; the docstring cites the
reference implementation it reproduces the semantics of.  All run through
the Table/DataFrame API so Catalyst owns the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import MONEY, dsum, money, t

# --------------------------------------------------------------------------
# Calc: fused project+filter (StreamExecCalc.scala:39 / BatchExecCalc.scala)
# --------------------------------------------------------------------------
_CALC_ORACLE = """
SELECT o_orderkey,
       CAST(o_custkey % 100 AS BIGINT) AS cust_bucket,
       upper(o_orderpriority) AS prio,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 1000
"""


@register("calc_project_filter", _CALC_ORACLE)
def calc_project_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000))
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).cast("bigint").alias("cust_bucket"),
            F.upper("o_orderpriority").alias("prio"),
            (money("o_totalprice") * 2).cast("double").alias("double_price"),
        )
    )


# --------------------------------------------------------------------------
# VALUES literal source (StreamExecValues.scala / BatchExecValues.scala)
# --------------------------------------------------------------------------
_VALUES_ORACLE = """
SELECT id, tag, CAST(score AS DOUBLE) AS score
FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL))
  AS v(id, tag, score)
"""


@register("values_literal", _VALUES_ORACLE)
def values_literal(spark, sf_dir):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        "id int, tag string, score double")


# --------------------------------------------------------------------------
# Set operations (StreamExecUnion; ReplaceIntersectWithSemiJoinRule etc.)
# --------------------------------------------------------------------------
_SETOP_TABLES = """
WITH a AS (SELECT CAST(c_custkey % 40 AS BIGINT) AS k FROM customer WHERE c_custkey <= 400),
     b AS (SELECT CAST(c_custkey % 25 AS BIGINT) AS k FROM customer WHERE c_custkey > 200)
"""


def _setop_frames(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    a = (cust.filter(F.col("c_custkey") <= 400)
         .select((F.col("c_custkey") % 40).cast("bigint").alias("k")))
    b = (cust.filter(F.col("c_custkey") > 200)
         .select((F.col("c_custkey") % 25).cast("bigint").alias("k")))
    return a, b


@register("setop_union_all", _SETOP_TABLES + "SELECT k FROM a UNION ALL SELECT k FROM b")
def setop_union_all(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.unionAll(b)


@register("setop_union_distinct", _SETOP_TABLES + "SELECT k FROM a UNION SELECT k FROM b")
def setop_union_distinct(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.union(b).distinct()


@register("setop_intersect", _SETOP_TABLES + "SELECT k FROM a INTERSECT SELECT k FROM b")
def setop_intersect(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.intersect(b)


@register("setop_intersect_all", _SETOP_TABLES + "SELECT k FROM a INTERSECT ALL SELECT k FROM b")
def setop_intersect_all(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.intersectAll(b)


@register("setop_except", _SETOP_TABLES + "SELECT k FROM a EXCEPT SELECT k FROM b")
def setop_except(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.exceptAll(b).distinct()


@register("setop_except_all", _SETOP_TABLES + "SELECT k FROM a EXCEPT ALL SELECT k FROM b")
def setop_except_all(spark, sf_dir):
    a, b = _setop_frames(spark, sf_dir)
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# Join kinds (BatchExecHashJoin.scala:53, BatchExecSortMergeJoin.scala:52,
# BatchExecNestedLoopJoin.scala:45, StreamingSemiAntiJoinOperator.java:35)
# --------------------------------------------------------------------------
_JOIN_INNER_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_totalprice > 50000
"""


@register("join_inner_equi", _JOIN_INNER_ORACLE)
def join_inner_equi(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return (cust.join(orders, cust.c_custkey == orders.o_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    money("o_totalprice").cast("double").alias("o_totalprice")))


_JOIN_LEFT_ORACLE = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


@register("join_left_outer", _JOIN_LEFT_ORACLE)
def join_left_outer(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
            .groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders")))


_JOIN_FULL_ORACLE = """
SELECT k, n_a, n_b FROM (
  SELECT coalesce(a.k, b.k) AS k, a.cnt AS n_a, b.cnt AS n_b
  FROM (SELECT c_nationkey AS k, count(*) AS cnt FROM customer WHERE c_custkey <= 300 GROUP BY 1) a
  FULL JOIN (SELECT s_nationkey AS k, count(*) AS cnt FROM supplier GROUP BY 1) b
  ON a.k = b.k
) q
"""


@register("join_full_outer", _JOIN_FULL_ORACLE)
def join_full_outer(spark, sf_dir):
    a = (t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
         .groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("cnt")))
    b = (t(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("cnt")))
    return (a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
            .select(F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
                    F.col("a.cnt").alias("n_a"), F.col("b.cnt").alias("n_b")))


_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""


@register("join_semi_exists", _JOIN_SEMI_ORACLE)
def join_semi_exists(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


_JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


@register("join_anti_not_exists", _JOIN_ANTI_ORACLE)
def join_anti_not_exists(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


_JOIN_THETA_ORACLE = """
SELECT r_name, n_name FROM region JOIN nation ON r_regionkey < n_regionkey
"""


@register("join_theta_nonequi", _JOIN_THETA_ORACLE)
def join_theta_nonequi(spark, sf_dir):
    """Non-equi join -> BroadcastNestedLoopJoin (BatchExecNestedLoopJoin)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (r.join(n, r.r_regionkey < n.n_regionkey)
            .select("r_name", "n_name"))


_JOIN_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("join_cross", _JOIN_CROSS_ORACLE)
def join_cross(spark, sf_dir):
    return (t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation"))
            .select("r_name", "n_name"))


# --------------------------------------------------------------------------
# Aggregations (BatchExecHashAggregate, SplitAggregateRule, aggfunctions/)
# --------------------------------------------------------------------------
_AGG_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


@register("agg_count_distinct", _AGG_DISTINCT_ORACLE)
def agg_count_distinct(spark, sf_dir):
    return (t(spark, sf_dir, "orders").groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_cust"),
                 F.count("*").alias("n_orders")))


_AGG_STATS_ORACLE = """
SELECT l_returnflag,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_min_max_sumsq", _AGG_STATS_ORACLE)
def agg_min_max_sumsq(spark, sf_dir):
    """Moment sums for variance/stddev computed exactly (decimal) so the
    downstream var/stddev derivation is order-independent — the engine
    analog of Flink's STDDEV/VAR rewrite (AggregateReduceFunctionsRule)."""
    q = money("l_quantity")
    return (t(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.sum((q * q).cast("decimal(28,4)")).cast("double").alias("sum_sq"),
        F.sum(q).cast("double").alias("sum_qty"),
        F.count("*").alias("n")))


_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", _GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark, sf_dir):
    """DecomposeGroupingSetsRule.scala:205 -> Catalyst Expand node."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", _CUBE_ORACLE)
def agg_cube(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n")))


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", _ROLLUP_ORACLE)
def agg_rollup(spark, sf_dir):
    return (t(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n")))


_LISTAGG_ORACLE = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey
"""


@register("agg_listagg_sorted", _LISTAGG_ORACLE)
def agg_listagg_sorted(spark, sf_dir):
    """LISTAGG (aggfunctions/ListAggFunction.java) with deterministic order."""
    return (t(spark, sf_dir, "nation").groupBy("n_regionkey")
            .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("names")))


_FIRST_LAST_ORACLE = """
SELECT user_id,
       arg_min(event_type, ts) AS first_type,
       arg_max(event_type, ts) AS last_type,
       arg_min(event_id, ts) AS first_id,
       arg_max(event_id, ts) AS last_id
FROM events GROUP BY user_id
"""


@register("agg_first_last_value", _FIRST_LAST_ORACLE)
def agg_first_last_value(spark, sf_dir):
    """FIRST_VALUE/LAST_VALUE by event time (FirstValueAggFunction.java).
    Implemented with min_by/max_by — deterministic because ts is unique
    per user at microsecond resolution."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("min_by(event_type, ts)").alias("first_type"),
        F.expr("max_by(event_type, ts)").alias("last_type"),
        F.expr("min_by(event_id, ts)").alias("first_id"),
        F.expr("max_by(event_id, ts)").alias("last_id"))


# --------------------------------------------------------------------------
# Sort / limit / offset (BatchExecSortLimit, DataSet.first, Table.offset)
# --------------------------------------------------------------------------
_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


@register("sort_limit_topk", _SORT_LIMIT_ORACLE)
def sort_limit_topk(spark, sf_dir):
    """orderBy+limit -> TakeOrderedAndProject (no full sort at scale)."""
    return (t(spark, sf_dir, "orders")
            .select("o_orderkey", money("o_totalprice").cast("double").alias("o_totalprice"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(25))


_OFFSET_ORACLE = """
SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20
"""


@register("sort_limit_offset", _OFFSET_ORACLE)
def sort_limit_offset(spark, sf_dir):
    return (t(spark, sf_dir, "orders").select("o_orderkey")
            .orderBy("o_orderkey").offset(20).limit(10))


# --------------------------------------------------------------------------
# UNNEST / Correlate (LogicalUnnestRule.scala:49, StreamExecCorrelate)
# --------------------------------------------------------------------------
_UNNEST_ORACLE = """
SELECT doc_id, word, COUNT(*) AS n
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 20) w
WHERE word <> ''
GROUP BY doc_id, word
"""


@register("unnest_explode_words", _UNNEST_ORACLE)
def unnest_explode_words(spark, sf_dir):
    """UNNEST == explode(); the lateral/Correlate path (UDTF) in Spark."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("doc_id", "word").agg(F.count("*").alias("n")))


# --------------------------------------------------------------------------
# Subqueries (scalar; IN handled in tpch_q18; SEMI_JOIN_RULES)
# --------------------------------------------------------------------------
_SCALAR_SUBQ_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.5 FROM orders)
"""


@register("subquery_scalar", _SCALAR_SUBQ_ORACLE)
def subquery_scalar(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("_ord_sq")
    return spark.sql("""
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        FROM _ord_sq
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 1.5 FROM _ord_sq)
    """)


# --------------------------------------------------------------------------
# Scalar function suites (FlinkSqlOperatorTable.java; SqlFunctionUtils.java)
# --------------------------------------------------------------------------
_STRING_FN_ORACLE = """
SELECT c_custkey,
       upper(c_name) AS up, lower(c_name) AS lo,
       CAST(length(c_name) AS BIGINT) AS len,
       substr(c_name, 1, 8) AS pre,
       concat(c_name, '#', c_mktsegment) AS cat,
       replace(c_name, 'Customer', 'C') AS repl,
       ltrim(rtrim(concat(' ', c_name, ' '))) AS trimmed,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
       reverse(c_mktsegment) AS rev,
       CAST(strpos(c_name, '0') AS BIGINT) AS pos,
       md5(c_name) AS digest
FROM customer WHERE c_custkey <= 100
"""


@register("scalar_string_functions", _STRING_FN_ORACLE)
def scalar_string_functions(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"), F.lower("c_name").alias("lo"),
        F.length("c_name").cast("bigint").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("cat"),
        F.regexp_replace("c_name", "Customer", "C").alias("repl"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" ")))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr(F.col("c_name"), "0").cast("bigint").alias("pos"),
        F.md5("c_name").alias("digest"))


_DT_FN_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
       o_orderdate + INTERVAL 90 DAY AS due,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt
FROM orders WHERE o_orderkey <= 500
"""


@register("scalar_datetime_functions", _DT_FN_ORACLE)
def scalar_datetime_functions(spark, sf_dir):
    """Temporal surface (SqlDateTimeUtils.java): EXTRACT family, trunc,
    interval arithmetic, DATE_FORMAT.  dayofweek: both engines 1=Sunday."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("mstart"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fmt"))


_MATH_FN_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(abs(l_quantity - 25) AS DOUBLE) AS absv,
       round(sqrt(l_quantity), 6) AS sq,
       round(ln(l_quantity + 1), 6) AS lg,
       round(power(l_quantity, 2), 6) AS pw,
       CAST(floor(l_quantity / 7) AS DOUBLE) AS fl,
       CAST(ceil(l_quantity / 7) AS DOUBLE) AS ce,
       CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS md,
       round(sin(l_quantity) + cos(l_quantity), 6) AS trig,
       CAST(sign(l_quantity - 25) AS DOUBLE) AS sg
FROM lineitem WHERE l_orderkey <= 200
"""


@register("scalar_math_functions", _MATH_FN_ORACLE)
def scalar_math_functions(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(q - 25).cast("double").alias("absv"),
        F.round(F.sqrt(q), 6).alias("sq"),
        F.round(F.log(q + 1), 6).alias("lg"),
        F.round(F.pow(q, 2), 6).alias("pw"),
        F.floor(q / 7).cast("double").alias("fl"),
        F.ceil(q / 7).cast("double").alias("ce"),
        (q.cast("bigint") % 7).cast("bigint").alias("md"),
        F.round(F.sin(q) + F.cos(q), 6).alias("trig"),
        F.signum(q - 25).alias("sg"))


_CASE_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'low' END AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status,
       CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderpriority END AS prio
FROM orders WHERE o_orderkey <= 1000
"""


@register("scalar_case_coalesce_nullif", _CASE_ORACLE)
def scalar_case_coalesce_nullif(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "high")
         .when(F.col("o_totalprice") > 50000, "mid")
         .otherwise("low").alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status"),
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("string"))
         .otherwise(F.col("o_orderpriority")).alias("prio"))


_FLINK_FN_ORACLE = """
SELECT doc_id,
       string_split(source, 'c')[2] AS split_idx,
       (n_chars IS NOT NULL AND regexp_matches(CAST(n_chars AS VARCHAR), '^[0-9]+$')) AS isdigit,
       regexp_matches(lang, '^[a-z]+$') AS isalpha,
       CASE WHEN n_chars >= 0 THEN floor(n_chars / 7.0 * 100) / 100
            ELSE ceil(n_chars / 7.0 * 100) / 100 END AS trunc2
FROM documents WHERE doc_id < 50
"""


@register("scalar_flink_compat_functions", _FLINK_FN_ORACLE)
def scalar_flink_compat_functions(spark, sf_dir):
    """Flink-named compat functions (FlinkSqlOperatorTable: SPLIT_INDEX,
    IS_DIGIT, IS_ALPHA, TRUNCATE) registered as SQL-body UDFs."""
    from flink_release_1_10_0_spark.functions.registry import register_flink_functions
    register_flink_functions(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("_docs_fn")
    return spark.sql("""
        SELECT doc_id,
               split_index(source, 'c', 1) AS split_idx,
               is_digit(CAST(n_chars AS STRING)) AS isdigit,
               is_alpha(lang) AS isalpha,
               truncate(n_chars / 7.0, 2) AS trunc2
        FROM _docs_fn WHERE doc_id < 50
    """)


# --------------------------------------------------------------------------
# SIMILAR TO + OVERLAPS (FlinkSqlOperatorTable SIMILAR_TO via
# SqlLikeUtils.similar; OVERLAPS with Calcite period normalization).
# DuckDB's SIMILAR TO takes a raw regex (no %/_ wildcard translation),
# so the oracle states the SQL:2003 semantics explicitly with
# regexp_full_match on the translated pattern.
# --------------------------------------------------------------------------
_SIMILAR_ORACLE = """
WITH q AS (
  SELECT doc_id, lang,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS s1,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id + 10) MINUTE AS e1,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 5 MINUTE AS s2,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 15 MINUTE AS e2
  FROM documents WHERE doc_id < 100)
SELECT doc_id,
       regexp_full_match(lang, '(e|f).') AS lang_ef,
       regexp_full_match(lang, '.*n.*') AS has_n,
       (LEAST(s1, e1) <= GREATEST(s2, e2)
        AND LEAST(s2, e2) <= GREATEST(s1, e1)) AS periods_overlap
FROM q
"""


@register("scalar_similar_to_overlaps", _SIMILAR_ORACLE)
def scalar_similar_to_overlaps(spark, sf_dir):
    from flink_release_1_10_0_spark.functions.registry import register_flink_functions
    register_flink_functions(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("_docs_sim")
    return spark.sql("""
        WITH q AS (
          SELECT doc_id, lang,
                 TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS s1,
                 TIMESTAMP '2024-01-01 00:00:00' + (doc_id + 10) * INTERVAL 1 MINUTE AS e1,
                 TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 5 MINUTE AS s2,
                 TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 15 MINUTE AS e2
          FROM _docs_sim WHERE doc_id < 100)
        SELECT doc_id,
               similar_to(lang, '(e|f)_') AS lang_ef,
               similar_to(lang, '%n%') AS has_n,
               ts_overlaps(s1, e1, s2, e2) AS periods_overlap
        FROM q
    """)


# --------------------------------------------------------------------------
# The reference's front-page program: WordCount
# (flink-examples/flink-examples-batch/.../wordcount/WordCount.java —
# readTextFile -> flatMap(Tokenizer) -> groupBy(0) -> sum(1)), run
# verbatim through the DataStream facade: flat_map -> key_by -> count.
# A reference user's first program must run unchanged in spirit.
# --------------------------------------------------------------------------
_WORDCOUNT_ORACLE = """
SELECT word, COUNT(*) AS count
FROM (SELECT unnest(string_split(
          lower(regexp_replace(text, '[^a-zA-Z ]', ' ', 'g')), ' ')) AS word
      FROM documents)
WHERE word <> ''
GROUP BY word
"""


@register("flink_wordcount_batch", _WORDCOUNT_ORACLE)
def flink_wordcount_batch(spark, sf_dir):
    from flink_release_1_10_0_spark.streaming.datastream import DataStream

    docs = t(spark, sf_dir, "documents")
    tokens = (DataStream(docs)
              .flat_map("split(lower(regexp_replace(text, '[^a-zA-Z ]', ' ')), ' ')",
                        "word")
              .filter("word <> ''"))
    return tokens.key_by("word").count().df
