"""TPC-DS-shaped report queries, wave 8 — families not yet covered by
``tpcds.py``.

Same provenance as tpcds.py: the reference's published batch-SQL baseline
is TPC-DS 103/103 at SF1 (``flink-end-to-end-tests/flink-tpcds-test/src/
main/java/org/apache/flink/table/tpcds/TpcdsTestProgram.java:56-70``).
This wave adds one representative query per remaining family, re-shaped
onto the synthetic star schema:

- q94/q95: orders spanning >=2 distinct suppliers with an EXISTS-returned
  condition (multi-fact correlation through one fact table)
- q65: cheapest/min-aggregate join-back (per-part supplier at min revenue)
- q59: week-day revenue pivot compared across two half-years
- q90: am/pm activity-count ratio on the event stream table
- q21: per-supplier before/after-pivot-date quantity band filter
- q44: best-5 / worst-5 items by exact revenue, unioned with labels
- q58: cross-channel tolerance screen (returned vs kept revenue per part)
- q70: rollup restricted to top-k ranked nations per region (window in a
  subquery feeding GROUP BY ROLLUP)
- q31: quarter-over-quarter growth acceleration via exact cross-multiply
- q89: monthly deviation from a brand's mean month (exact-decimal form)
- q45/q48: disjunctive predicate (substring IN-list OR IN-subquery) that
  Spark must rewrite as a marker left join (OR over a semi join)
- q77: per-channel totals combined by FULL OUTER JOIN with COALESCE

Wave 9 (appended below):

- q4/q11: cross-channel growth-ratio comparison per customer
- q9/q28: banded scalar-subquery single-row report (sum + count distinct
  per quantity band, expressed as one conditional-aggregation pass)
- q13: OR-of-ANDs selective filter across dimension attributes
- q61: single-row promotional-share ratio
- q97: channel-overlap matrix from a FULL OUTER join of key sets
- q87: EXCEPT inside an aggregate (lapsed-customer count)

Wave 10 (appended below):

- q36: rank WITHIN each rollup level (PARTITION BY lochierarchy +
  parent-key CASE idiom over GROUPING())
- q2: ISO week-of-year revenue joined across two years

Scale notes: identical conventions to tpcds.py — dimensions broadcast,
fact-fact correlation through pre-aggregated frames keyed on the join
column, windows always partitioned, money math in DECIMAL so comparisons
and join-back equalities are exact on both engines (no float-boundary
flakes in filters).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import (MONEY, dsum,
                                                        dsum_expr, money, t)

# --------------------------------------------------------------------------
# q94/q95 family: orders whose lineitems span >= 2 distinct suppliers AND
# that have at least one returned line.  The DISTINCT-count restriction and
# the EXISTS probe are both per-orderkey pre-aggregations on the SAME fact,
# so the plan is two shuffles on l_orderkey plus a broadcast-free semi join
# — never a fact x fact row join.
# --------------------------------------------------------------------------
_MULTI_SUPP_ORACLE = """
WITH multi AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2
)
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN multi ON o_orderkey = multi.l_orderkey
WHERE EXISTS (SELECT 1 FROM lineitem r
              WHERE r.l_orderkey = o_orderkey AND r.l_returnflag = 'R')
GROUP BY o_year
"""


@register("tpcds_q_multi_supplier_orders", _MULTI_SUPP_ORACLE)
def tpcds_q_multi_supplier_orders(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    multi = (li.groupBy("l_orderkey")
             .agg(F.countDistinct("l_suppkey").alias("n_supp"))
             .filter(F.col("n_supp") >= 2).select("l_orderkey"))
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (orders
            .join(multi, orders.o_orderkey == multi.l_orderkey, "left_semi")
            .join(returned, orders.o_orderkey == returned.l_orderkey,
                  "left_semi")
            .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# q65 family: min-aggregate join-back — for every part, the supplier(s)
# whose revenue on that part equals the part's minimum supplier revenue.
# The join-back equality is on an exact DECIMAL sum, so ties and matches
# are bit-identical across engines.
# --------------------------------------------------------------------------
_MIN_COST_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY l_partkey, l_suppkey
), mn AS (
  SELECT l_partkey AS mpk, MIN(rev) AS min_rev FROM ps GROUP BY l_partkey
)
SELECT p_name, s_name, CAST(ps.rev AS DOUBLE) AS supplier_rev
FROM ps
JOIN mn ON ps.l_partkey = mn.mpk AND ps.rev = mn.min_rev
JOIN part ON ps.l_partkey = p_partkey
JOIN supplier ON ps.l_suppkey = s_suppkey
"""


@register("tpcds_q_min_cost_supplier", _MIN_COST_ORACLE)
def tpcds_q_min_cost_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(money("l_extendedprice")).alias("rev")))
    mn = ps.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("rev").alias("min_rev"))
    return (ps.join(mn, (ps.l_partkey == mn.mpk) & (ps.rev == mn.min_rev))
            .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
            .select("p_name", "s_name",
                    F.col("rev").cast("double").alias("supplier_rev")))


# --------------------------------------------------------------------------
# q59 family: revenue by day-of-week, first half-year vs second half-year,
# joined on the weekday for a ratio report.  Spark's dayofweek() is
# 1-based Sunday=1; DuckDB's is 0-based Sunday=0 — the Spark side shifts
# by -1 so both report Sunday=0..Saturday=6.
# --------------------------------------------------------------------------
_WEEKDAY_HALVES_ORACLE = """
WITH h1 AS (
  SELECT dayofweek(o_orderdate) AS weekday,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY weekday
), h2 AS (
  SELECT dayofweek(o_orderdate) AS weekday,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY weekday
)
SELECT CAST(h1.weekday AS BIGINT) AS weekday,
       CAST(h1.rev AS DOUBLE) AS rev_h1,
       CAST(h2.rev AS DOUBLE) AS rev_h2,
       ROUND(CAST(h2.rev AS DOUBLE) / CAST(h1.rev AS DOUBLE), 6) AS h2_over_h1
FROM h1 JOIN h2 ON h1.weekday = h2.weekday
"""


@register("tpcds_q_weekday_halves", _WEEKDAY_HALVES_ORACLE)
def tpcds_q_weekday_halves(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")

    def half(lo, hi):
        return (orders
                .filter((F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")))
                .groupBy((F.dayofweek("o_orderdate") - 1).cast("bigint")
                         .alias("weekday"))
                .agg(F.sum(money("o_totalprice")).alias("rev")))

    h1 = half("1996-01-01 00:00:00", "1996-07-01 00:00:00")
    h2 = (half("1996-07-01 00:00:00", "1997-01-01 00:00:00")
          .withColumnRenamed("weekday", "weekday2")
          .withColumnRenamed("rev", "rev2"))
    j = h1.join(h2, h1.weekday == h2.weekday2)
    r1 = F.col("rev").cast("double")
    r2 = F.col("rev2").cast("double")
    return j.select("weekday", r1.alias("rev_h1"), r2.alias("rev_h2"),
                    F.round(r2 / r1, 6).alias("h2_over_h1"))


# --------------------------------------------------------------------------
# q90 family: am/pm activity ratio — one pass over the event table with
# conditional counts, ratio rounded on identically-shaped doubles.
# --------------------------------------------------------------------------
_AMPM_ORACLE = """
SELECT event_type,
       CAST(SUM(CASE WHEN hour(ts) >= 6  AND hour(ts) < 12 THEN 1 ELSE 0 END) AS BIGINT) AS am_cnt,
       CAST(SUM(CASE WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 1 ELSE 0 END) AS BIGINT) AS pm_cnt,
       ROUND(CAST(SUM(CASE WHEN hour(ts) >= 6  AND hour(ts) < 12 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 1 ELSE 0 END) AS DOUBLE),
             6) AS am_pm_ratio
FROM events
GROUP BY event_type
HAVING SUM(CASE WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 1 ELSE 0 END) > 0
"""


@register("tpcds_q_ampm_ratio", _AMPM_ORACLE)
def tpcds_q_ampm_ratio(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hr = F.hour("ts")
    am = F.sum(F.when((hr >= 6) & (hr < 12), 1).otherwise(0).cast("bigint"))
    pm = F.sum(F.when((hr >= 12) & (hr < 18), 1).otherwise(0).cast("bigint"))
    agg = (ev.groupBy("event_type")
           .agg(am.alias("am_cnt"), pm.alias("pm_cnt"))
           .filter(F.col("pm_cnt") > 0))
    ratio = F.col("am_cnt").cast("double") / F.col("pm_cnt").cast("double")
    return agg.select("event_type", "am_cnt", "pm_cnt",
                      F.round(ratio, 6).alias("am_pm_ratio"))


# --------------------------------------------------------------------------
# q21 family: per-supplier shipped quantity before/after a pivot date,
# keeping suppliers whose two halves are within a 2x band of each other.
# The band test cross-multiplies exact decimals — no float boundary.
# --------------------------------------------------------------------------
_BEFORE_AFTER_ORACLE = """
WITH sq AS (
  SELECT l_suppkey,
         SUM(CASE WHEN l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                  THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_before,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                  THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_after
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_name,
       CAST(qty_before AS DOUBLE) AS qty_before,
       CAST(qty_after  AS DOUBLE) AS qty_after
FROM sq JOIN supplier ON l_suppkey = s_suppkey
WHERE qty_before > 0 AND qty_after > 0
  AND qty_after * 2 >= qty_before AND qty_before * 2 >= qty_after
"""


@register("tpcds_q_before_after_ratio", _BEFORE_AFTER_ORACLE)
def tpcds_q_before_after_ratio(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    pivot = F.lit("1998-01-01 00:00:00").cast("timestamp")
    zero = F.lit(0).cast(MONEY)
    before = F.sum(F.when(F.col("l_shipdate") < pivot,
                          money("l_quantity")).otherwise(zero))
    after = F.sum(F.when(F.col("l_shipdate") >= pivot,
                         money("l_quantity")).otherwise(zero))
    sq = (li.groupBy("l_suppkey")
          .agg(before.alias("qty_before"), after.alias("qty_after")))
    band = ((F.col("qty_before") > 0) & (F.col("qty_after") > 0)
            & (F.col("qty_after") * 2 >= F.col("qty_before"))
            & (F.col("qty_before") * 2 >= F.col("qty_after")))
    return (sq.filter(band)
            .join(F.broadcast(supp), sq.l_suppkey == supp.s_suppkey)
            .select("s_name",
                    F.col("qty_before").cast("double").alias("qty_before"),
                    F.col("qty_after").cast("double").alias("qty_after")))


# --------------------------------------------------------------------------
# q44 family: best-5 and worst-5 items by exact total revenue, unioned
# under a side label.  Ties broken by partkey so both LIMITs are
# deterministic.
# --------------------------------------------------------------------------
_BEST_WORST_ORACLE = """
WITH pr AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY l_partkey
)
SELECT * FROM (
  SELECT 'best' AS side, p_name, CAST(rev AS DOUBLE) AS revenue
  FROM pr JOIN part ON l_partkey = p_partkey
  ORDER BY rev DESC, l_partkey LIMIT 5
)
UNION ALL
SELECT * FROM (
  SELECT 'worst' AS side, p_name, CAST(rev AS DOUBLE) AS revenue
  FROM pr JOIN part ON l_partkey = p_partkey
  ORDER BY rev ASC, l_partkey LIMIT 5
)
"""


@register("tpcds_q_best_worst_items", _BEST_WORST_ORACLE)
def tpcds_q_best_worst_items(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    pr = (li.groupBy("l_partkey")
          .agg(F.sum(money("l_extendedprice")).alias("rev"))
          .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey))
    best = (pr.orderBy(F.desc("rev"), "l_partkey").limit(5)
            .select(F.lit("best").alias("side"), "p_name",
                    F.col("rev").cast("double").alias("revenue")))
    worst = (pr.orderBy(F.asc("rev"), "l_partkey").limit(5)
             .select(F.lit("worst").alias("side"), "p_name",
                     F.col("rev").cast("double").alias("revenue")))
    return best.unionAll(worst)


# --------------------------------------------------------------------------
# q58 family: cross-channel tolerance — parts whose returned-line revenue
# is within [0.5x, 1.5x] of their kept-line revenue.  Both channels come
# from ONE scan via conditional aggregation; the tolerance test
# cross-multiplies exact decimals.
# --------------------------------------------------------------------------
_TOLERANCE_ORACLE = """
WITH ch AS (
  SELECT l_partkey,
         SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_ret,
         SUM(CASE WHEN l_returnflag <> 'R'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_kept
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS p_key,
       CAST(rev_ret  AS DOUBLE) AS rev_ret,
       CAST(rev_kept AS DOUBLE) AS rev_kept
FROM ch
WHERE rev_ret > 0 AND rev_kept > 0
  AND rev_ret * 2 >= rev_kept AND rev_ret * 2 <= rev_kept * 3
"""


@register("tpcds_q_channel_within_tolerance", _TOLERANCE_ORACLE)
def tpcds_q_channel_within_tolerance(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast(MONEY)
    ret = F.sum(F.when(F.col("l_returnflag") == "R",
                       money("l_extendedprice")).otherwise(zero))
    kept = F.sum(F.when(F.col("l_returnflag") != "R",
                        money("l_extendedprice")).otherwise(zero))
    ch = (li.groupBy("l_partkey")
          .agg(ret.alias("rev_ret"), kept.alias("rev_kept")))
    tol = ((F.col("rev_ret") > 0) & (F.col("rev_kept") > 0)
           & (F.col("rev_ret") * 2 >= F.col("rev_kept"))
           & (F.col("rev_ret") * 2 <= F.col("rev_kept") * 3))
    return (ch.filter(tol)
            .select(F.col("l_partkey").alias("p_key"),
                    F.col("rev_ret").cast("double").alias("rev_ret"),
                    F.col("rev_kept").cast("double").alias("rev_kept")))


# --------------------------------------------------------------------------
# q70 family: ROLLUP restricted by a window computed in a subquery — only
# the top-3 revenue nations per region contribute to the report, then the
# region/nation hierarchy is rolled up over the survivors.  The rank is
# over an exact decimal sum (deterministic ordering), partitioned by
# region (never a global window).
# --------------------------------------------------------------------------
_TOP_STATES_ORACLE = """
WITH nat AS (
  SELECT r_name, n_name,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
), ranked AS (
  SELECT *, RANK() OVER (PARTITION BY r_name ORDER BY rev DESC, n_name) AS rnk
  FROM nat
)
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM ranked WHERE rnk <= 3
GROUP BY ROLLUP (r_name, n_name)
"""


@register("tpcds_q_top_states_rollup", _TOP_STATES_ORACLE)
def tpcds_q_top_states_rollup(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    nat = (orders.join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
           .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
           .groupBy("r_name", "n_name")
           .agg(F.sum(money("o_totalprice")).alias("rev")))
    w = Window.partitionBy("r_name").orderBy(F.desc("rev"), "n_name")
    top = nat.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 3)
    return (top.rollup("r_name", "n_name")
            .agg(dsum_expr(F.col("rev"), "revenue"))
            .select(F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
                    F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
                    "revenue"))


# --------------------------------------------------------------------------
# q31 family: quarter-over-quarter growth acceleration.  Nations where Q2
# revenue grew faster into Q3 than Q1 did into Q2 — the ratio comparison
# q3/q2 > q2/q1 is evaluated as the cross-multiplication q3*q1 > q2*q2 in
# DOUBLE over exact decimal sums: both engines perform the same two IEEE
# multiplications on bit-identical inputs (decimal cross-multiplication
# overflows DuckDB's DECIMAL(18) product path at sf>=0.1 magnitudes).
# --------------------------------------------------------------------------
_QOQ_ORACLE = """
WITH q AS (
  SELECT n_name, quarter(o_orderdate) AS qt,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  GROUP BY n_name, qt
)
SELECT q1.n_name AS n_name,
       CAST(q1.rev AS DOUBLE) AS rev_q1,
       CAST(q2.rev AS DOUBLE) AS rev_q2,
       CAST(q3.rev AS DOUBLE) AS rev_q3
FROM q q1
JOIN q q2 ON q1.n_name = q2.n_name AND q1.qt = 1 AND q2.qt = 2
JOIN q q3 ON q1.n_name = q3.n_name AND q3.qt = 3
WHERE CAST(q3.rev AS DOUBLE) * CAST(q1.rev AS DOUBLE)
      > CAST(q2.rev AS DOUBLE) * CAST(q2.rev AS DOUBLE)
"""


@register("tpcds_q_qoq_growth", _QOQ_ORACLE)
def tpcds_q_qoq_growth(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    q = (orders
         .filter((F.col("o_orderdate")
                  >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate")
                    < F.lit("1996-10-01 00:00:00").cast("timestamp")))
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .groupBy("n_name", F.quarter("o_orderdate").alias("qt"))
         .agg(F.sum(money("o_totalprice")).alias("rev")))
    q1 = q.filter(F.col("qt") == 1).select(F.col("n_name").alias("n1"),
                                           F.col("rev").alias("r1"))
    q2 = q.filter(F.col("qt") == 2).select(F.col("n_name").alias("n2"),
                                           F.col("rev").alias("r2"))
    q3 = q.filter(F.col("qt") == 3).select(F.col("n_name").alias("n3"),
                                           F.col("rev").alias("r3"))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (q1.join(q2, F.col("n1") == F.col("n2"))
            .join(q3, F.col("n1") == F.col("n3"))
            .filter(dbl("r3") * dbl("r1") > dbl("r2") * dbl("r2"))
            .select(F.col("n1").alias("n_name"),
                    F.col("r1").cast("double").alias("rev_q1"),
                    F.col("r2").cast("double").alias("rev_q2"),
                    F.col("r3").cast("double").alias("rev_q3")))


# --------------------------------------------------------------------------
# q89 family: months that deviate >25% from their brand's mean month in
# 1996.  |m*C - T| * 4 > T in exact decimals (m = month revenue, T =
# brand total, C = month count) — the float-free form of
# |m - T/C| > 0.25 * T/C.
# --------------------------------------------------------------------------
_BRAND_DEV_ORACLE = """
WITH m AS (
  SELECT p_brand, month(o_orderdate) AS o_month,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY p_brand, o_month
), b AS (
  SELECT p_brand AS bb, CAST(SUM(rev) AS DECIMAL(18,2)) AS total,
         COUNT(*) AS c FROM m GROUP BY p_brand
)
SELECT p_brand, CAST(o_month AS BIGINT) AS o_month,
       CAST(rev AS DOUBLE) AS month_rev,
       CAST(total AS DOUBLE) AS brand_total,
       c AS n_months
FROM m JOIN b ON p_brand = bb
WHERE ABS(rev * CAST(c AS DECIMAL(9,0)) - total) * 4 > total
"""


@register("tpcds_q_monthly_brand_deviation", _BRAND_DEV_ORACLE)
def tpcds_q_monthly_brand_deviation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    part = t(spark, sf_dir, "part")
    m = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .groupBy("p_brand", F.month("o_orderdate").alias("o_month"))
         .agg(F.sum(money("l_extendedprice")).cast(MONEY).alias("rev")))
    b = (m.groupBy(F.col("p_brand").alias("bb"))
         .agg(F.sum("rev").cast(MONEY).alias("total"),
              F.count(F.lit(1)).alias("c")))
    j = m.join(b, m.p_brand == b.bb)
    dev = (F.abs(F.col("rev") * F.col("c").cast("decimal(9,0)")
                 - F.col("total")) * 4 > F.col("total"))
    return (j.filter(dev)
            .select("p_brand", F.col("o_month").cast("bigint").alias("o_month"),
                    F.col("rev").cast("double").alias("month_rev"),
                    F.col("total").cast("double").alias("brand_total"),
                    F.col("c").alias("n_months")))


# --------------------------------------------------------------------------
# q45/q48 family: disjunctive predicate — substring IN-list OR membership
# in a subquery.  SQL writes `x IN (SELECT ...)` inside an OR; Spark
# cannot OR across a semi join, so the idiomatic rewrite is a marker
# LEFT JOIN against the distinct subquery keys and a filter on
# (substring-cond OR marker IS NOT NULL).
# --------------------------------------------------------------------------
_DISJUNCTIVE_ORACLE = """
WITH heavy AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
)
SELECT n_name,
       COUNT(DISTINCT c_custkey) AS n_cust,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE substring(c_name, 18, 1) IN ('3', '7')
   OR c_custkey IN (SELECT o_custkey FROM heavy)
GROUP BY n_name
"""


@register("tpcds_q_disjunctive_customers", _DISJUNCTIVE_ORACLE)
def tpcds_q_disjunctive_customers(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    heavy = (orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") >= 12)
             .select(F.col("o_custkey").alias("h_key"),
                     F.lit(1).alias("h_mark")))
    j = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .join(heavy, cust.c_custkey == heavy.h_key, "left"))
    cond = (F.substring("c_name", 18, 1).isin("3", "7")
            | F.col("h_mark").isNotNull())
    return (j.filter(cond)
            .groupBy("n_name")
            .agg(F.countDistinct("c_custkey").alias("n_cust"),
                 dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# q77 family: per-channel totals combined by FULL OUTER JOIN — urgent-order
# revenue vs returned-line revenue per nation, nations missing from either
# channel surfacing with a zero via COALESCE.
# --------------------------------------------------------------------------
_FULL_OUTER_ORACLE = """
WITH urg AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_urgent
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderpriority = '1-URGENT'
  GROUP BY n_name
), ret AS (
  SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_returned
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY n_name
)
SELECT COALESCE(urg.n_name, ret.n_name) AS n_name,
       CAST(COALESCE(rev_urgent,  CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS rev_urgent,
       CAST(COALESCE(rev_returned, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS rev_returned
FROM urg FULL JOIN ret ON urg.n_name = ret.n_name
"""


@register("tpcds_q_channel_full_outer", _FULL_OUTER_ORACLE)
def tpcds_q_channel_full_outer(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    zero = F.lit(0).cast(MONEY)
    urg = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
           .groupBy(F.col("n_name").alias("un"))
           .agg(F.sum(money("o_totalprice")).alias("rev_urgent")))
    ret = (li.filter(F.col("l_returnflag") == "R")
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
           .groupBy(F.col("n_name").alias("rn"))
           .agg(F.sum(money("l_extendedprice")).alias("rev_returned")))
    return (urg.join(ret, F.col("un") == F.col("rn"), "full_outer")
            .select(F.coalesce("un", "rn").alias("n_name"),
                    F.coalesce("rev_urgent", zero).cast("double")
                    .alias("rev_urgent"),
                    F.coalesce("rev_returned", zero).cast("double")
                    .alias("rev_returned")))


# --------------------------------------------------------------------------
# q4/q11 family: growth-ratio comparison across channels — customers whose
# urgent-order revenue grew faster from 1996 to 1997 than their
# non-urgent revenue.  The ratio-of-ratios filter u97/u96 > n97/n96 is
# evaluated as the cross-multiplication u97*n96 > n97*u96 in DOUBLE over
# exact decimal sums (IEEE-deterministic on both engines; decimal
# products overflow DuckDB's int64 decimal path at scale).
# --------------------------------------------------------------------------
_GROWTH_COMPARE_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 'u' ELSE 'n' END AS chan,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY o_custkey, chan, yr
)
SELECT u96.o_custkey AS custkey,
       CAST(u96.rev AS DOUBLE) AS urgent_1996,
       CAST(u97.rev AS DOUBLE) AS urgent_1997,
       CAST(n96.rev AS DOUBLE) AS other_1996,
       CAST(n97.rev AS DOUBLE) AS other_1997
FROM rev u96
JOIN rev u97 ON u96.o_custkey = u97.o_custkey
            AND u96.chan = 'u' AND u96.yr = 1996 AND u97.chan = 'u' AND u97.yr = 1997
JOIN rev n96 ON u96.o_custkey = n96.o_custkey AND n96.chan = 'n' AND n96.yr = 1996
JOIN rev n97 ON u96.o_custkey = n97.o_custkey AND n97.chan = 'n' AND n97.yr = 1997
WHERE CAST(u97.rev AS DOUBLE) * CAST(n96.rev AS DOUBLE)
      > CAST(n97.rev AS DOUBLE) * CAST(u96.rev AS DOUBLE)
"""


@register("tpcds_q_growth_ratio_compare", _GROWTH_COMPARE_ORACLE)
def tpcds_q_growth_ratio_compare(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    rev = (orders
           .filter((F.col("o_orderdate")
                    >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                   & (F.col("o_orderdate")
                      < F.lit("1998-01-01 00:00:00").cast("timestamp")))
           .groupBy("o_custkey",
                    F.when(F.col("o_orderpriority") == "1-URGENT", "u")
                    .otherwise("n").alias("chan"),
                    F.year("o_orderdate").cast("bigint").alias("yr"))
           .agg(F.sum(money("o_totalprice")).alias("rev")))

    def leg(chan, yr, alias):
        return (rev.filter((F.col("chan") == chan) & (F.col("yr") == yr))
                .select(F.col("o_custkey").alias(f"k_{alias}"),
                        F.col("rev").alias(alias)))

    u96, u97 = leg("u", 1996, "u96"), leg("u", 1997, "u97")
    n96, n97 = leg("n", 1996, "n96"), leg("n", 1997, "n97")
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (u96.join(u97, F.col("k_u96") == F.col("k_u97"))
            .join(n96, F.col("k_u96") == F.col("k_n96"))
            .join(n97, F.col("k_u96") == F.col("k_n97"))
            .filter(dbl("u97") * dbl("n96") > dbl("n97") * dbl("u96"))
            .select(F.col("k_u96").alias("custkey"),
                    F.col("u96").cast("double").alias("urgent_1996"),
                    F.col("u97").cast("double").alias("urgent_1997"),
                    F.col("n96").cast("double").alias("other_1996"),
                    F.col("n97").cast("double").alias("other_1997")))


# --------------------------------------------------------------------------
# q9/q28 family: banded scalar-subquery report — one output row whose
# columns are independent aggregates over disjoint quantity bands
# (sum + count distinct per band).  Spark expresses the five scalar
# subqueries as ONE conditional-aggregation pass (no repeated scans).
# --------------------------------------------------------------------------
_BAND_REPORT_ORACLE = """
SELECT
  CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem
        WHERE l_quantity >= 1  AND l_quantity < 11) AS DOUBLE) AS rev_b1,
  CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
        WHERE l_quantity >= 1  AND l_quantity < 11) AS BIGINT) AS parts_b1,
  CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem
        WHERE l_quantity >= 11 AND l_quantity < 21) AS DOUBLE) AS rev_b2,
  CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
        WHERE l_quantity >= 11 AND l_quantity < 21) AS BIGINT) AS parts_b2,
  CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem
        WHERE l_quantity >= 21 AND l_quantity < 31) AS DOUBLE) AS rev_b3,
  CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
        WHERE l_quantity >= 21 AND l_quantity < 31) AS BIGINT) AS parts_b3
"""


@register("tpcds_q_band_scalar_report", _BAND_REPORT_ORACLE)
def tpcds_q_band_scalar_report(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")

    def band(lo, hi, idx):
        inb = (q >= lo) & (q < hi)
        rev = (F.sum(F.when(inb, money("l_extendedprice")))
               .cast("double").alias(f"rev_b{idx}"))
        parts = (F.count_distinct(F.when(inb, F.col("l_partkey")))
                 .cast("bigint").alias(f"parts_b{idx}"))
        return [rev, parts]

    return li.agg(*band(1, 11, 1), *band(11, 21, 2), *band(21, 31, 3))


# --------------------------------------------------------------------------
# q13 family: OR-of-ANDs selective filter across dimension attributes —
# each disjunct pins a different (segment, price-band) combination, the
# classic demographic-cluster filter that defeats simple pushdown.
# --------------------------------------------------------------------------
_OR_OF_ANDS_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING'  AND o_totalprice >= 100000 AND o_totalprice < 200000)
   OR (c_mktsegment = 'MACHINERY' AND o_totalprice >= 50000  AND o_totalprice < 150000)
   OR (c_mktsegment = 'AUTOMOBILE' AND o_totalprice < 50000)
GROUP BY c_mktsegment
"""


@register("tpcds_q_or_of_ands_filter", _OR_OF_ANDS_ORACLE)
def tpcds_q_or_of_ands_filter(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    p = F.col("o_totalprice")
    seg = F.col("c_mktsegment")
    cond = (((seg == "BUILDING") & (p >= 100000) & (p < 200000))
            | ((seg == "MACHINERY") & (p >= 50000) & (p < 150000))
            | ((seg == "AUTOMOBILE") & (p < 50000)))
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .filter(cond)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# q61 family: single-row promotional-share report — urgent-priority
# revenue as a share of total revenue, two aggregates over one scan.
# --------------------------------------------------------------------------
_PROMO_RATIO_ORACLE = """
SELECT
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice AS DECIMAL(18,2))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_rev,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
  ROUND(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(o_totalprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS urgent_share
FROM orders
"""


@register("tpcds_q_promo_ratio", _PROMO_RATIO_ORACLE)
def tpcds_q_promo_ratio(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    zero = F.lit(0).cast(MONEY)
    urgent = F.sum(F.when(F.col("o_orderpriority") == "1-URGENT",
                          money("o_totalprice")).otherwise(zero))
    total = F.sum(money("o_totalprice"))
    agg = orders.agg(urgent.cast("double").alias("urgent_rev"),
                     total.cast("double").alias("total_rev"))
    return agg.select("urgent_rev", "total_rev",
                      F.round(F.col("urgent_rev") / F.col("total_rev"), 6)
                      .alias("urgent_share"))


# --------------------------------------------------------------------------
# q97 family: channel-overlap matrix — how many customers appear in both
# channels vs only one, computed from a FULL OUTER join of the two
# distinct-customer sets (single-row report).
# --------------------------------------------------------------------------
_OVERLAP_ORACLE = """
WITH urg AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), ret AS (
  SELECT DISTINCT o_custkey FROM orders
  JOIN lineitem ON o_orderkey = l_orderkey WHERE l_returnflag = 'R'
)
SELECT
  CAST(SUM(CASE WHEN urg.o_custkey IS NOT NULL AND ret.o_custkey IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
  CAST(SUM(CASE WHEN urg.o_custkey IS NOT NULL AND ret.o_custkey IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
  CAST(SUM(CASE WHEN urg.o_custkey IS NULL AND ret.o_custkey IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS returned_only
FROM urg FULL JOIN ret ON urg.o_custkey = ret.o_custkey
"""


@register("tpcds_q_channel_overlap_matrix", _OVERLAP_ORACLE)
def tpcds_q_channel_overlap_matrix(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    urg = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
           .select(F.col("o_custkey").alias("uk")).distinct())
    ret = (orders.join(li.filter(F.col("l_returnflag") == "R"),
                       orders.o_orderkey == li.l_orderkey, "left_semi")
           .select(F.col("o_custkey").alias("rk")).distinct())
    j = urg.join(ret, F.col("uk") == F.col("rk"), "full_outer")
    n = lambda c: F.col(c).isNotNull()  # noqa: E731
    cnt = lambda cond, a: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(a)  # noqa: E731
    return j.agg(cnt(n("uk") & n("rk"), "both_channels"),
                 cnt(n("uk") & ~n("rk"), "urgent_only"),
                 cnt(~n("uk") & n("rk"), "returned_only"))


# --------------------------------------------------------------------------
# q87 family: EXCEPT in an aggregate context — count of customers who
# ordered in 1996 but placed no order in 1997 (set difference of key
# projections, then COUNT).
# --------------------------------------------------------------------------
_EXCEPT_COUNT_ORACLE = """
SELECT COUNT(*) AS n_lapsed FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
"""


@register("tpcds_q_except_count", _EXCEPT_COUNT_ORACLE)
def tpcds_q_except_count(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")

    def yr(lo, hi):
        return (orders
                .filter((F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")))
                .select("o_custkey").distinct())

    lapsed = (yr("1996-01-01 00:00:00", "1997-01-01 00:00:00")
              .exceptAll(yr("1997-01-01 00:00:00", "1998-01-01 00:00:00")))
    return lapsed.agg(F.count(F.lit(1)).alias("n_lapsed"))


# --------------------------------------------------------------------------
# q36 family: rank WITHIN each rollup level — leaf rows rank against
# their siblings under the same parent, subtotal rows rank against other
# subtotals (the `PARTITION BY lochierarchy, CASE WHEN grouping(...)` =
# 0 THEN parent END` idiom).  Rank is over an exact decimal sum.
# --------------------------------------------------------------------------
_RANK_IN_ROLLUP_ORACLE = """
WITH r AS (
  SELECT COALESCE(r_name, 'ALL') AS region_name,
         COALESCE(n_name, 'ALL') AS nation_name,
         CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS lochierarchy,
         CASE WHEN GROUPING(n_name) = 0 THEN r_name END AS parent_key,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP (r_name, n_name)
)
SELECT region_name, nation_name, lochierarchy,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(RANK() OVER (PARTITION BY lochierarchy, parent_key
                         ORDER BY rev DESC, nation_name) AS BIGINT)
         AS rank_within_parent
FROM r
"""


@register("tpcds_q_rank_within_rollup_level", _RANK_IN_ROLLUP_ORACLE)
def tpcds_q_rank_within_rollup_level(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    r = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
         .rollup("r_name", "n_name")
         .agg(F.sum(money("o_totalprice")).alias("rev"),
              (F.grouping("r_name") * 2 + F.grouping("n_name"))
              .cast("bigint").alias("lochierarchy"),
              F.when(F.grouping("n_name") == 0, F.col("r_name"))
              .alias("parent_key"))
         .select(F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
                 F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
                 "lochierarchy", "parent_key", "rev"))
    w = (Window.partitionBy("lochierarchy", "parent_key")
         .orderBy(F.desc("rev"), "nation_name"))
    return r.select("region_name", "nation_name", "lochierarchy",
                    F.col("rev").cast("double").alias("revenue"),
                    F.rank().over(w).cast("bigint")
                    .alias("rank_within_parent"))


# --------------------------------------------------------------------------
# q2 family: week-over-year comparison — per ISO week-of-year revenue in
# 1996 joined to the same week in 1997, ratio report.  Both engines use
# ISO week numbering.
# --------------------------------------------------------------------------
_WEEKLY_YOY_ORACLE = """
WITH w96 AS (
  SELECT weekofyear(o_orderdate) AS wk,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY wk
), w97 AS (
  SELECT weekofyear(o_orderdate) AS wk,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY wk
)
SELECT CAST(w96.wk AS BIGINT) AS wk,
       CAST(w96.rev AS DOUBLE) AS rev_1996,
       CAST(w97.rev AS DOUBLE) AS rev_1997,
       ROUND(CAST(w97.rev AS DOUBLE) / CAST(w96.rev AS DOUBLE), 6) AS yoy_ratio
FROM w96 JOIN w97 ON w96.wk = w97.wk
"""


@register("tpcds_q_weekly_yoy_ratio", _WEEKLY_YOY_ORACLE)
def tpcds_q_weekly_yoy_ratio(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")

    def yr(lo, hi, suffix):
        return (orders
                .filter((F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")))
                .groupBy(F.weekofyear("o_orderdate").cast("bigint")
                         .alias(f"wk{suffix}"))
                .agg(F.sum(money("o_totalprice")).alias(f"rev{suffix}")))

    w96 = yr("1996-01-01 00:00:00", "1997-01-01 00:00:00", "96")
    w97 = yr("1997-01-01 00:00:00", "1998-01-01 00:00:00", "97")
    j = w96.join(w97, F.col("wk96") == F.col("wk97"))
    r96 = F.col("rev96").cast("double")
    r97 = F.col("rev97").cast("double")
    return j.select(F.col("wk96").alias("wk"), r96.alias("rev_1996"),
                    r97.alias("rev_1997"),
                    F.round(r97 / r96, 6).alias("yoy_ratio"))
