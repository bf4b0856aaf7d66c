"""TPC-DS-shaped report queries.

The reference's published batch-SQL correctness baseline is TPC-DS
103/103 variants at SF1 (``flink-end-to-end-tests/flink-tpcds-test/
src/main/java/org/apache/flink/table/tpcds/TpcdsTestProgram.java:56-70``,
``test_tpcds.sh:22``) with stats-driven join reordering
(``TpcdsStatsProvider.java``).  The synthetic star schema here has no
TPC-DS tables, so this module reproduces the *query shapes* a Flink
batch-SQL user migrating TPC-DS-style reports actually relies on, one
per family, over the available schema:

- date-dimension-driven fact scan + LIMIT report (q3 family)
- multi-fact star join through shared dimensions (q25/q29)
- rollup report with GROUPING() labels (q27/q36)
- windowed rank over an aggregated star join (q67/q98)
- EXISTS / NOT EXISTS customer segmentation (q10/q35)
- channel UNION ALL roll-together (q5/q71)
- over-average correlated comparison (q1/q30)
- year-over-year self-join of aggregates (q74)
- multi-level COUNT(DISTINCT) by period (q14 class)
- revenue-share-of-total window (ratio_to_report, q98)
- price-band CASE segmentation (q48 class)
- period INTERSECT of customer sets (q38)

Scale notes: every dimension join is broadcast (nation/region/part are
small by star-schema design); fact-fact combination happens through
pre-aggregated per-key frames, never a raw fact×fact join; window
functions are always partitioned.  All aggregates use the package's
exact-decimal conventions so oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import (MONEY, disc_price,
                                                        dsum, dsum_expr,
                                                        money, t)

# --------------------------------------------------------------------------
# q3 family: date-dim filter -> star join -> top-N revenue report.
# The date dimension is derived (year/month of o_orderdate); the filter
# reaches the orders scan as a pushed predicate, exactly how a date_dim
# join prunes at 100 TB (here: partition/row-group pruning on the fact).
# --------------------------------------------------------------------------
_DATE_BRAND_ORACLE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_year, p_brand
ORDER BY revenue DESC, o_year, p_brand
LIMIT 10
"""


@register("tpcds_q_date_brand_topn", _DATE_BRAND_ORACLE)
def tpcds_q_date_brand_topn(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    part = t(spark, sf_dir, "part")
    star = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(part), li.l_partkey == part.p_partkey))
    return (star.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                         "p_brand")
            .agg(dsum_expr(disc_price(), "revenue"))
            .orderBy(F.desc("revenue"), "o_year", "p_brand")
            .limit(10))


# --------------------------------------------------------------------------
# q25/q29 family: TWO fact measures through shared dimensions.  Facts are
# pre-aggregated per customer BEFORE combining (never fact×fact raw):
# order revenue per customer x lineitem return quantity per customer,
# reported by nation.
# --------------------------------------------------------------------------
_MULTI_FACT_ORACLE = """
WITH ord AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_rev
  FROM orders GROUP BY o_custkey
), ret AS (
  SELECT o_custkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ret_qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey
)
SELECT n_name,
       CAST(SUM(CAST(order_rev AS DECIMAL(18,2))) AS DOUBLE) AS total_rev,
       CAST(SUM(CAST(COALESCE(ret_qty, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_ret_qty,
       COUNT(*) AS n_customers
FROM customer
JOIN ord ON c_custkey = ord.o_custkey
LEFT JOIN ret ON c_custkey = ret.o_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("tpcds_q_multi_fact_star", _MULTI_FACT_ORACLE)
def tpcds_q_multi_fact_star(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    ord_agg = orders.groupBy("o_custkey").agg(dsum("o_totalprice", "order_rev"))
    ret_agg = (li.filter(F.col("l_returnflag") == "R")
               .join(orders.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == orders.o_orderkey)
               .groupBy("o_custkey").agg(dsum("l_quantity", "ret_qty")))
    joined = (cust.join(ord_agg, cust.c_custkey == ord_agg.o_custkey)
              .join(ret_agg.withColumnRenamed("o_custkey", "r_custkey"),
                    cust.c_custkey == F.col("r_custkey"), "left")
              .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey))
    return (joined.groupBy("n_name")
            .agg(dsum("order_rev", "total_rev"),
                 dsum_expr(F.coalesce(F.col("ret_qty"), F.lit(0)).cast(MONEY),
                           "total_ret_qty"),
                 F.count(F.lit(1)).alias("n_customers")))


# --------------------------------------------------------------------------
# q27/q36 family: hierarchy rollup with GROUPING() labels — the report
# shape where subtotal lines are tagged by aggregation level.
# --------------------------------------------------------------------------
_ROLLUP_LABEL_ORACLE = """
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS lochierarchy,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("tpcds_q_rollup_hierarchy", _ROLLUP_LABEL_ORACLE)
def tpcds_q_rollup_hierarchy(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    star = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (star.rollup("r_name", "n_name")
            .agg((F.grouping("r_name").cast("bigint") * 2
                  + F.grouping("n_name").cast("bigint")).alias("lochierarchy"),
                 dsum("o_totalprice", "revenue"))
            .select(F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
                    F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
                    "lochierarchy", "revenue"))


# --------------------------------------------------------------------------
# q67/q98 family: windowed rank over an aggregated star join — top-3
# revenue brands WITHIN each part type (partitioned window, never global).
# --------------------------------------------------------------------------
_RANK_STAR_ORACLE = """
WITH agg AS (
  SELECT p_type, p_brand,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand
)
SELECT p_type, p_brand, revenue,
       CAST(rank() OVER (PARTITION BY p_type ORDER BY revenue DESC, p_brand) AS BIGINT) AS rk
FROM agg
QUALIFY rk <= 3
"""


@register("tpcds_q_rank_in_category", _RANK_STAR_ORACLE)
def tpcds_q_rank_in_category(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    agg = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("p_type", "p_brand")
           .agg(dsum("l_extendedprice", "revenue")))
    w = Window.partitionBy("p_type").orderBy(F.desc("revenue"), "p_brand")
    return (agg.withColumn("rk", F.rank().over(w).cast("bigint"))
            .filter(F.col("rk") <= 3))


# --------------------------------------------------------------------------
# q10/q35 family: EXISTS-heavy customer segmentation — customers active
# in 1997 (EXISTS) with no 1996 activity (NOT EXISTS), i.e. the
# new-customer cohort, counted by market segment.  Both decorrelated
# subqueries become semi/anti joins against the fact.
# --------------------------------------------------------------------------
_EXISTS_SEG_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1996)
GROUP BY c_mktsegment
"""


@register("tpcds_q_exists_segmentation", _EXISTS_SEG_ORACLE)
def tpcds_q_exists_segmentation(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    o97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    o96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return (cust
            .join(o97, cust.c_custkey == o97.o_custkey, "left_semi")
            .join(o96, cust.c_custkey == o96.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 dsum("c_acctbal", "total_acctbal")))


# --------------------------------------------------------------------------
# q5/q71 family: channel UNION ALL rolled together — revenue by nation
# and "channel" where channels are unioned sub-facts (here: fulfilled
# orders vs open orders as the two channels).
# --------------------------------------------------------------------------
_CHANNEL_UNION_ORACLE = """
WITH channels AS (
  SELECT 'fulfilled' AS channel, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'open' AS channel, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
)
SELECT channel, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM channels
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY channel, n_name
"""


@register("tpcds_q_channel_union", _CHANNEL_UNION_ORACLE)
def tpcds_q_channel_union(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    chan = (orders.filter(F.col("o_orderstatus") == "F")
            .select(F.lit("fulfilled").alias("channel"), "o_custkey", "o_totalprice")
            .unionByName(
                orders.filter(F.col("o_orderstatus") == "O")
                .select(F.lit("open").alias("channel"), "o_custkey", "o_totalprice")))
    return (chan.join(cust, chan.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("channel", "n_name")
            .agg(dsum("o_totalprice", "revenue"),
                 F.count(F.lit(1)).alias("n_orders")))


# --------------------------------------------------------------------------
# q1/q30 family: over-average comparison — customers whose total spend
# exceeds 1.2x their nation's average customer spend.  The correlated
# subquery decorrelates into a per-nation aggregate broadcast back.
# --------------------------------------------------------------------------
_OVER_AVG_ORACLE = """
WITH spend AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_name, c_nationkey
), nat_avg AS (
  -- exact decimal sum / count, not AVG over doubles: float summation
  -- order differs between engines and the > filter must not flip
  SELECT c_nationkey,
         CAST(SUM(CAST(total_spend AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_spend
  FROM spend GROUP BY c_nationkey
)
SELECT c_custkey, c_name, round(total_spend, 2) AS total_spend,
       round(avg_spend, 6) AS nation_avg
FROM spend JOIN nat_avg USING (c_nationkey)
WHERE total_spend > 1.2 * avg_spend
"""


@register("tpcds_q_over_nation_avg", _OVER_AVG_ORACLE)
def tpcds_q_over_nation_avg(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    spend = (cust.join(orders, cust.c_custkey == orders.o_custkey)
             .groupBy("c_custkey", "c_name", "c_nationkey")
             .agg(dsum("o_totalprice", "total_spend")))
    nat_avg = spend.groupBy("c_nationkey").agg(
        (F.sum(money("total_spend")).cast("double")
         / F.count(F.lit(1))).alias("avg_spend"))
    return (spend.join(F.broadcast(nat_avg), "c_nationkey")
            .filter(F.col("total_spend") > 1.2 * F.col("avg_spend"))
            .select("c_custkey", "c_name",
                    F.round("total_spend", 2).alias("total_spend"),
                    F.round("avg_spend", 6).alias("nation_avg")))


# --------------------------------------------------------------------------
# q74 family: year-over-year growth — per-customer revenue in 1996 vs
# 1997, customers whose 1997/1996 ratio > 1.  Self-join of the SAME
# per-(customer, year) aggregate, pivoted by year.
# --------------------------------------------------------------------------
_YOY_ORACLE = """
WITH per_year AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_custkey, o_year
)
SELECT a.o_custkey AS c_custkey, round(a.rev, 2) AS rev_1996,
       round(b.rev, 2) AS rev_1997,
       round(b.rev / a.rev, 6) AS growth
FROM per_year a JOIN per_year b
  ON a.o_custkey = b.o_custkey AND a.o_year = 1996 AND b.o_year = 1997
WHERE b.rev > a.rev
"""


@register("tpcds_q_year_over_year", _YOY_ORACLE)
def tpcds_q_year_over_year(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    per_year = (orders
                .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
                .filter(F.col("o_year").isin(1996, 1997))
                .groupBy("o_custkey", "o_year")
                .agg(dsum("o_totalprice", "rev")))
    a = per_year.filter(F.col("o_year") == 1996).alias("a")
    b = per_year.filter(F.col("o_year") == 1997).alias("b")
    return (a.join(b, F.col("a.o_custkey") == F.col("b.o_custkey"))
            .filter(F.col("b.rev") > F.col("a.rev"))
            .select(F.col("a.o_custkey").alias("c_custkey"),
                    F.round(F.col("a.rev"), 2).alias("rev_1996"),
                    F.round(F.col("b.rev"), 2).alias("rev_1997"),
                    F.round(F.col("b.rev") / F.col("a.rev"), 6).alias("growth")))


# --------------------------------------------------------------------------
# q14 class: multi-level COUNT(DISTINCT) per period — distinct customers
# and distinct orders per month alongside exact revenue.
# --------------------------------------------------------------------------
_MULTI_DISTINCT_ORACLE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_year, o_month
"""


@register("tpcds_q_monthly_distinct_counts", _MULTI_DISTINCT_ORACLE)
def tpcds_q_monthly_distinct_counts(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (orders.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                           F.month("o_orderdate").cast("bigint").alias("o_month"))
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.countDistinct("o_orderkey").alias("n_orders"),
                 dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# q98 family: revenue share of total within a category —
# ratio_to_report expressed as a partitioned sum window.
# --------------------------------------------------------------------------
_REV_SHARE_ORACLE = """
WITH agg AS (
  SELECT p_type, p_brand,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand
)
SELECT p_type, p_brand, revenue,
       round(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                            OVER (PARTITION BY p_type) AS DOUBLE), 6) AS rev_share
FROM agg
"""


@register("tpcds_q_revenue_share", _REV_SHARE_ORACLE)
def tpcds_q_revenue_share(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    agg = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("p_type", "p_brand")
           .agg(dsum("l_extendedprice", "revenue")))
    w = Window.partitionBy("p_type")
    # exact decimal window sum: float summation order differs per engine
    return agg.withColumn(
        "rev_share",
        F.round(F.col("revenue")
                / F.sum(money("revenue")).over(w).cast("double"), 6))


# --------------------------------------------------------------------------
# q48 class: CASE price-band segmentation — quantity buckets x band
# revenue in one scan-side CASE aggregation.
# --------------------------------------------------------------------------
_PRICE_BAND_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_quantity < 10 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS rev_small,
       CAST(SUM(CASE WHEN l_quantity >= 10 AND l_quantity < 30 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS rev_mid,
       CAST(SUM(CASE WHEN l_quantity >= 30 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS rev_large,
       CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted
FROM lineitem
GROUP BY l_returnflag
"""


@register("tpcds_q_price_band_case", _PRICE_BAND_ORACLE)
def tpcds_q_price_band_case(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def band(cond, alias):
        return (F.sum(F.when(cond, money("l_extendedprice"))
                      .otherwise(F.lit(0).cast(MONEY)))
                .cast("double").alias(alias))

    return li.groupBy("l_returnflag").agg(
        band(F.col("l_quantity") < 10, "rev_small"),
        band((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 30), "rev_mid"),
        band(F.col("l_quantity") >= 30, "rev_large"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"))


# --------------------------------------------------------------------------
# q38 family: period INTERSECT — customers active in BOTH 1996 and 1997
# (set intersection of keyed projections), counted by nation.
# --------------------------------------------------------------------------
_INTERSECT_ORACLE = """
WITH both_years AS (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT n_name, COUNT(*) AS n_repeat_customers
FROM both_years
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("tpcds_q_repeat_customers_intersect", _INTERSECT_ORACLE)
def tpcds_q_repeat_customers_intersect(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y96.intersect(y97)
    return (both.join(cust, both.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_repeat_customers")))


# --------------------------------------------------------------------------
# q15 class: top segment per period via aggregated max-join (a GROUP BY
# feeding a having-max filter — the "best performer" report).
# --------------------------------------------------------------------------
_BEST_SEGMENT_ORACLE = """
WITH seg AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_year, c_mktsegment
), mx AS (
  SELECT o_year, MAX(revenue) AS max_rev FROM seg GROUP BY o_year
)
SELECT seg.o_year, c_mktsegment, revenue
FROM seg JOIN mx ON seg.o_year = mx.o_year AND seg.revenue = mx.max_rev
"""


@register("tpcds_q_best_segment_per_year", _BEST_SEGMENT_ORACLE)
def tpcds_q_best_segment_per_year(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    seg = (orders.join(cust, orders.o_custkey == cust.c_custkey)
           .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                    "c_mktsegment")
           .agg(dsum("o_totalprice", "revenue")))
    mx = seg.groupBy("o_year").agg(F.max("revenue").alias("max_rev"))
    return (seg.join(F.broadcast(mx.withColumnRenamed("o_year", "m_year")),
                     (seg.o_year == F.col("m_year"))
                     & (seg.revenue == F.col("max_rev")))
            .select("o_year", "c_mktsegment", "revenue"))


# ==========================================================================
# Second wave of TPC-DS report shapes (reference baseline is 103 variants;
# see module docstring).  Families covered here:
#
# - cumulative channel comparison via aligned window sums (q51)
# - order-count-band "frequent buyer" HAVING report (q34/q73)
# - cross-joined scalar-count panel (q88)
# - moving-average deviation over a monthly series (q47/q57)
# - aligned period-over-period monthly comparison (q59 shape, monthly)
# - per-supplier lateness conditional counts with HAVING (q21)
# - EXISTS + NOT EXISTS order filter to a scalar report (q16)
# - spend histogram by bucketed aggregate (q54 class)
# - AVG-over-hierarchy ROLLUP (q22)
# - return-ratio top-N with partitioned rank (q49)
# - per-customer cross-channel ratio from one conditional pass (q78)
# - returns-adjusted net revenue via signed CASE aggregation (q93)
# ==========================================================================

# --------------------------------------------------------------------------
# q51 family: two channels' cumulative revenue, aligned per month within
# year, reporting months where the fulfilled channel's running total
# exceeds the open channel's.  Window is partitioned by year (never
# global); the month series per year is tiny after pre-aggregation.
# --------------------------------------------------------------------------
_CUMULATIVE_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month, o_orderstatus,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders WHERE o_orderstatus IN ('F', 'O')
  GROUP BY o_year, o_month, o_orderstatus
), cum AS (
  SELECT o_year, o_month, o_orderstatus,
         CAST(SUM(rev) OVER (PARTITION BY o_year, o_orderstatus
                             ORDER BY o_month
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS cum_rev
  FROM monthly
)
SELECT f.o_year, f.o_month, f.cum_rev AS cum_fulfilled, o.cum_rev AS cum_open
FROM (SELECT * FROM cum WHERE o_orderstatus = 'F') f
JOIN (SELECT * FROM cum WHERE o_orderstatus = 'O') o
  ON f.o_year = o.o_year AND f.o_month = o.o_month
WHERE f.cum_rev > o.cum_rev
"""


@register("tpcds_q_cumulative_channel_compare", _CUMULATIVE_ORACLE)
def tpcds_q_cumulative_channel_compare(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    monthly = (orders.filter(F.col("o_orderstatus").isin("F", "O"))
               .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                        F.month("o_orderdate").cast("bigint").alias("o_month"),
                        "o_orderstatus")
               .agg(F.sum(money("o_totalprice")).alias("rev")))
    w = (Window.partitionBy("o_year", "o_orderstatus").orderBy("o_month")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = monthly.withColumn("cum_rev", F.sum("rev").over(w).cast("double"))
    f = cum.filter(F.col("o_orderstatus") == "F").alias("f")
    o = cum.filter(F.col("o_orderstatus") == "O").alias("o")
    return (f.join(o, (F.col("f.o_year") == F.col("o.o_year"))
                   & (F.col("f.o_month") == F.col("o.o_month")))
            .filter(F.col("f.cum_rev") > F.col("o.cum_rev"))
            .select(F.col("f.o_year").alias("o_year"),
                    F.col("f.o_month").alias("o_month"),
                    F.col("f.cum_rev").alias("cum_fulfilled"),
                    F.col("o.cum_rev").alias("cum_open")))


# --------------------------------------------------------------------------
# q34/q73 family: customers whose order count falls in a band (the
# "frequent buyer" report) — aggregate, HAVING-filter, join back to the
# dimension for names.
# --------------------------------------------------------------------------
_ORDER_BAND_ORACLE = """
SELECT c_custkey, c_name, CAST(cnt AS BIGINT) AS n_orders
FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
      HAVING COUNT(*) BETWEEN 8 AND 12) b
JOIN customer ON o_custkey = c_custkey
"""


@register("tpcds_q_order_count_band", _ORDER_BAND_ORACLE)
def tpcds_q_order_count_band(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    band = (orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders").between(8, 12)))
    return (band.join(cust, band.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "n_orders"))


# --------------------------------------------------------------------------
# q88 family: a panel of independent scalar counts cross-joined into one
# report row.  Each count is a 1-row aggregate; the joins are trivial
# broadcast nested loops over single rows (constant cost at any scale).
# --------------------------------------------------------------------------
_COUNT_PANEL_ORACLE = """
SELECT b1.n_q_under10, b2.n_q_10_20, b3.n_q_20_30, b4.n_q_over30
FROM (SELECT COUNT(*) AS n_q_under10 FROM lineitem WHERE l_quantity < 10) b1,
     (SELECT COUNT(*) AS n_q_10_20 FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20) b2,
     (SELECT COUNT(*) AS n_q_20_30 FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 30) b3,
     (SELECT COUNT(*) AS n_q_over30 FROM lineitem WHERE l_quantity >= 30) b4
"""


@register("tpcds_q_count_panel", _COUNT_PANEL_ORACLE)
def tpcds_q_count_panel(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def cnt(cond, alias):
        return li.filter(cond).agg(F.count(F.lit(1)).alias(alias))

    q = F.col("l_quantity")
    return (cnt(q < 10, "n_q_under10")
            .crossJoin(cnt((q >= 10) & (q < 20), "n_q_10_20"))
            .crossJoin(cnt((q >= 20) & (q < 30), "n_q_20_30"))
            .crossJoin(cnt(q >= 30, "n_q_over30")))


# --------------------------------------------------------------------------
# q47/q57 family: monthly revenue per brand vs the brand-year average —
# report months deviating more than 30% above the average.  The average
# comes from a window partitioned by (brand, year), never re-scanning.
# --------------------------------------------------------------------------
_MOVING_DEV_ORACLE = """
WITH monthly AS (
  SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, o_year, o_month
)
SELECT p_brand, o_year, o_month, CAST(rev AS DOUBLE) AS revenue,
       round(avg_rev, 6) AS avg_monthly_rev
FROM (SELECT p_brand, o_year, o_month, rev,
             CAST(SUM(rev) OVER (PARTITION BY p_brand, o_year) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand, o_year) AS avg_rev
      FROM monthly)
WHERE CAST(rev AS DOUBLE) > 1.3 * avg_rev
"""


@register("tpcds_q_moving_avg_deviation", _MOVING_DEV_ORACLE)
def tpcds_q_moving_avg_deviation(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    monthly = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .join(F.broadcast(part), li.l_partkey == part.p_partkey)
               .groupBy("p_brand",
                        F.year("o_orderdate").cast("bigint").alias("o_year"),
                        F.month("o_orderdate").cast("bigint").alias("o_month"))
               .agg(F.sum(money("l_extendedprice")).alias("rev")))
    w = Window.partitionBy("p_brand", "o_year")
    avg = (F.sum("rev").over(w).cast("double")
           / F.count(F.lit(1)).over(w))
    return (monthly.withColumn("avg_rev", avg)
            .filter(F.col("rev").cast("double") > 1.3 * F.col("avg_rev"))
            .select("p_brand", "o_year", "o_month",
                    F.col("rev").cast("double").alias("revenue"),
                    F.round("avg_rev", 6).alias("avg_monthly_rev")))


# --------------------------------------------------------------------------
# q59 family: aligned period-over-period comparison — monthly revenue of
# 1996 joined to the same month of 1997, with the growth ratio.
# --------------------------------------------------------------------------
_MONTH_ALIGN_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY o_year, o_month
)
SELECT a.o_month, round(a.rev, 2) AS rev_1996, round(b.rev, 2) AS rev_1997,
       round(b.rev / a.rev, 6) AS growth
FROM (SELECT * FROM monthly WHERE o_year = 1996) a
JOIN (SELECT * FROM monthly WHERE o_year = 1997) b ON a.o_month = b.o_month
"""


@register("tpcds_q_month_align_yoy", _MONTH_ALIGN_ORACLE)
def tpcds_q_month_align_yoy(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    monthly = (orders
               .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
               .filter(F.col("o_year").isin(1996, 1997))
               .groupBy("o_year",
                        F.month("o_orderdate").cast("bigint").alias("o_month"))
               .agg(dsum("o_totalprice", "rev")))
    a = monthly.filter(F.col("o_year") == 1996).alias("a")
    b = monthly.filter(F.col("o_year") == 1997).alias("b")
    return (a.join(b, F.col("a.o_month") == F.col("b.o_month"))
            .select(F.col("a.o_month").alias("o_month"),
                    F.round(F.col("a.rev"), 2).alias("rev_1996"),
                    F.round(F.col("b.rev"), 2).alias("rev_1997"),
                    F.round(F.col("b.rev") / F.col("a.rev"), 6).alias("growth")))


# --------------------------------------------------------------------------
# q21 family: per-supplier conditional lateness counts with HAVING —
# lineitems shipped more than 60 days after the order date count as late.
# --------------------------------------------------------------------------
_LATE_SUPPLIER_ORACLE = """
SELECT s_name, COUNT(*) AS n_items,
       CAST(COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                       THEN 1 END) AS BIGINT) AS n_late
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
HAVING COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 END) > 0
"""


@register("tpcds_q_supplier_late_counts", _LATE_SUPPLIER_ORACLE)
def tpcds_q_supplier_late_counts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.count(F.when(late, 1)).alias("n_late"))
            .filter(F.col("n_late") > 0))


# --------------------------------------------------------------------------
# q16 family: EXISTS + NOT EXISTS against the same fact collapsed into a
# scalar report — orders having lineitems but no returned lineitems.
# --------------------------------------------------------------------------
_NO_RETURNS_ORACLE = """
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
"""


@register("tpcds_q_orders_no_returns", _NO_RETURNS_ORACLE)
def tpcds_q_orders_no_returns(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    any_item = li.select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (orders
            .join(any_item, orders.o_orderkey == any_item.l_orderkey, "left_semi")
            .join(returned, orders.o_orderkey == returned.l_orderkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice", "total_price")))


# --------------------------------------------------------------------------
# q54 class: histogram of customers by bucketed total spend.  The bucket
# boundary is computed on the exact-decimal sum cast to double on both
# sides, so FLOOR sees bit-identical inputs.
# --------------------------------------------------------------------------
_SPEND_HIST_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT CAST(FLOOR(total_spend / 100000) AS BIGINT) AS spend_bucket,
       COUNT(*) AS n_customers
FROM spend GROUP BY spend_bucket
"""


@register("tpcds_q_spend_histogram", _SPEND_HIST_ORACLE)
def tpcds_q_spend_histogram(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(dsum("o_totalprice", "total_spend")))
    return (spend
            .groupBy(F.floor(F.col("total_spend") / 100000).cast("bigint")
                     .alias("spend_bucket"))
            .agg(F.count(F.lit(1)).alias("n_customers")))


# --------------------------------------------------------------------------
# q22 family: AVG over a product hierarchy ROLLUP — average quantity on
# hand by (brand, type) with subtotal rows.  AVG is computed as exact
# decimal SUM / COUNT on both sides (float-summation order never leaks).
# --------------------------------------------------------------------------
_AVG_ROLLUP_ORACLE = """
SELECT COALESCE(p_brand, 'ALL') AS brand, COALESCE(p_type, 'ALL') AS ptype,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_qty,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_brand, p_type)
"""


@register("tpcds_q_avg_qty_rollup", _AVG_ROLLUP_ORACLE)
def tpcds_q_avg_qty_rollup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .rollup("p_brand", "p_type")
            .agg(F.round(F.sum(money("l_quantity")).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_qty"),
                 F.count(F.lit(1)).alias("n_items"))
            .select(F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
                    F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
                    "avg_qty", "n_items"))


# --------------------------------------------------------------------------
# q49 family: worst return ratios — per part, returned quantity over total
# quantity, top 10 by ratio with a deterministic tie-break.  Both engines
# derive the ratio from exact decimal sums cast to double (IEEE division
# is bit-deterministic), so the rank order cannot diverge.
# --------------------------------------------------------------------------
_RETURN_RATIO_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(l_quantity AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS ret_qty
  FROM lineitem GROUP BY l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= 100
)
SELECT l_partkey, round(ret_qty / total_qty, 6) AS return_ratio
FROM per_part
ORDER BY ret_qty / total_qty DESC, l_partkey
LIMIT 10
"""


@register("tpcds_q_return_ratio_topn", _RETURN_RATIO_ORACLE)
def tpcds_q_return_ratio_topn(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(money("l_quantity")).alias("tq"),
                     F.sum(F.when(F.col("l_returnflag") == "R",
                                  money("l_quantity"))
                           .otherwise(F.lit(0).cast(MONEY))).alias("rq"))
                .filter(F.col("tq") >= 100))
    ratio = F.col("rq").cast("double") / F.col("tq").cast("double")
    return (per_part
            .select("l_partkey", F.round(ratio, 6).alias("return_ratio"),
                    ratio.alias("_r"))
            .orderBy(F.desc("_r"), "l_partkey")
            .limit(10)
            .select("l_partkey", "return_ratio"))


# --------------------------------------------------------------------------
# q78 family: per-customer cross-channel ratio from ONE conditional
# aggregation pass (no self-join of the fact): open-channel revenue over
# fulfilled-channel revenue for customers active in both.
# --------------------------------------------------------------------------
_CHANNEL_RATIO_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_f,
         SUM(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev_o
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS c_custkey,
       CAST(rev_f AS DOUBLE) AS rev_fulfilled,
       CAST(rev_o AS DOUBLE) AS rev_open,
       round(CAST(rev_o AS DOUBLE) / CAST(rev_f AS DOUBLE), 6) AS open_ratio
FROM per_cust WHERE rev_f > 0 AND rev_o > 0
"""


@register("tpcds_q_cross_channel_ratio", _CHANNEL_RATIO_ORACLE)
def tpcds_q_cross_channel_ratio(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    zero = F.lit(0).cast(MONEY)
    per_cust = (orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", money("o_totalprice"))
              .otherwise(zero)).alias("rev_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", money("o_totalprice"))
              .otherwise(zero)).alias("rev_o")))
    return (per_cust.filter((F.col("rev_f") > 0) & (F.col("rev_o") > 0))
            .select(F.col("o_custkey").alias("c_custkey"),
                    F.col("rev_f").cast("double").alias("rev_fulfilled"),
                    F.col("rev_o").cast("double").alias("rev_open"),
                    F.round(F.col("rev_o").cast("double")
                            / F.col("rev_f").cast("double"), 6)
                    .alias("open_ratio")))


# --------------------------------------------------------------------------
# q93 family: returns-adjusted net revenue — returned lineitems contribute
# negatively, expressed as one signed CASE aggregation over the fact.
# --------------------------------------------------------------------------
_NET_REVENUE_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN -CAST(l_extendedprice AS DECIMAL(18,2))
                     ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS net_revenue,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_linestatus
"""


@register("tpcds_q_returns_adjusted_revenue", _NET_REVENUE_ORACLE)
def tpcds_q_returns_adjusted_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    signed = (F.when(F.col("l_returnflag") == "R", -money("l_extendedprice"))
              .otherwise(money("l_extendedprice")))
    return (li.groupBy("l_linestatus")
            .agg(F.sum(signed).cast("double").alias("net_revenue"),
                 F.count(F.lit(1)).alias("n_items")))


# ==========================================================================
# Third wave: the remaining distinct TPC-DS report mechanics —
# coefficient-of-variation filters (q39), cross-sell semi-join pairs
# (q23), top-N-then-detail two-phase reports (q15), share-shift across
# periods (q31), LEFT-JOIN netting (q80), lag-based month-over-month
# decline (q47 mechanics), and independent-dimension GROUPING SETS (q5).
# ==========================================================================

# --------------------------------------------------------------------------
# q39 family: volatility screen — brands whose monthly revenue series has
# a high coefficient of variation.  stddev is DERIVED from exact decimal
# SUM and SUM-of-squares (never a float stddev aggregate, whose summation
# order differs between engines); the final arithmetic is identical
# double expressions on both sides.
# --------------------------------------------------------------------------
_COV_ORACLE = """
WITH monthly AS (
  SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, o_year, o_month
), stats AS (
  SELECT p_brand,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(rev) AS DOUBLE) AS s,
         CAST(SUM(rev * rev) AS DOUBLE) AS sq,
         COUNT(*) AS n_months
  FROM monthly GROUP BY p_brand
)
SELECT p_brand, n_months,
       round(sqrt(sq / n - (s / n) * (s / n)) / (s / n), 6) AS rev_cov
FROM stats
WHERE sqrt(sq / n - (s / n) * (s / n)) / (s / n) > 0.25
"""


@register("tpcds_q_cov_filter", _COV_ORACLE)
def tpcds_q_cov_filter(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    monthly = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .join(F.broadcast(part), li.l_partkey == part.p_partkey)
               .groupBy("p_brand",
                        F.year("o_orderdate").cast("bigint").alias("o_year"),
                        F.month("o_orderdate").cast("bigint").alias("o_month"))
               .agg(F.sum(money("l_extendedprice")).alias("rev")))
    stats = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rev").cast("double").alias("s"),
        F.sum((F.col("rev") * F.col("rev"))).cast("double").alias("sq"),
        F.count(F.lit(1)).alias("n_months"))
    mean = F.col("s") / F.col("n")
    cov = F.sqrt(F.col("sq") / F.col("n") - mean * mean) / mean
    return (stats.filter(cov > 0.25)
            .select("p_brand", "n_months", F.round(cov, 6).alias("rev_cov")))


# --------------------------------------------------------------------------
# q23 family: cross-sell — customers who bought BOTH a STANDARD-type and
# an ECONOMY-type part (two independent semi joins through the fact),
# counted by market segment.
# --------------------------------------------------------------------------
_CROSS_SELL_ORACLE = """
WITH bought AS (
  SELECT DISTINCT o_custkey, split_part(p_type, ' ', 1) AS type_class
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE split_part(p_type, ' ', 1) IN ('STANDARD', 'ECONOMY')
)
SELECT c_mktsegment, COUNT(*) AS n_cross_sell
FROM customer
WHERE EXISTS (SELECT 1 FROM bought b
              WHERE b.o_custkey = c_custkey AND type_class = 'STANDARD')
  AND EXISTS (SELECT 1 FROM bought b
              WHERE b.o_custkey = c_custkey AND type_class = 'ECONOMY')
GROUP BY c_mktsegment
"""


@register("tpcds_q_cross_sell", _CROSS_SELL_ORACLE)
def tpcds_q_cross_sell(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    cust = t(spark, sf_dir, "customer")
    bought = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .withColumn("type_class", F.split("p_type", " ").getItem(0))
              .filter(F.col("type_class").isin("STANDARD", "ECONOMY"))
              .select("o_custkey", "type_class").distinct())
    std = bought.filter(F.col("type_class") == "STANDARD").select("o_custkey")
    eco = bought.filter(F.col("type_class") == "ECONOMY").select("o_custkey")
    return (cust
            .join(std, cust.c_custkey == std.o_custkey, "left_semi")
            .join(eco, cust.c_custkey == eco.o_custkey, "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_cross_sell")))


# --------------------------------------------------------------------------
# q15 family: top-N-then-detail — pick the top 3 nations by revenue, then
# report the per-segment breakdown ONLY for those nations.  The top-N set
# is tiny and broadcasts into a semi join (no second full aggregation).
# --------------------------------------------------------------------------
_TOPN_DETAIL_ORACLE = """
WITH nat AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
), top3 AS (
  SELECT n_name FROM nat ORDER BY rev DESC, n_name LIMIT 3
)
SELECT n_name, c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN (SELECT n_name FROM top3)
GROUP BY n_name, c_mktsegment
"""


@register("tpcds_q_topn_then_detail", _TOPN_DETAIL_ORACLE)
def tpcds_q_topn_then_detail(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    star = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey))
    top3 = (star.groupBy("n_name")
            .agg(F.sum(money("o_totalprice")).alias("rev"))
            .orderBy(F.desc("rev"), "n_name").limit(3).select("n_name"))
    return (star.join(F.broadcast(top3), "n_name", "left_semi")
            .groupBy("n_name", "c_mktsegment")
            .agg(dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# q31 family: share shift — each nation's share of yearly revenue in 1996
# vs 1997; nations whose share grew.  Shares divide a nation aggregate by
# the year total (a 2-row broadcast), all double arithmetic identical on
# both sides.
# --------------------------------------------------------------------------
_SHARE_SHIFT_ORACLE = """
WITH nat_year AS (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY n_name, o_year
), shares AS (
  SELECT n_name, o_year,
         CAST(rev AS DOUBLE)
           / CAST(SUM(rev) OVER (PARTITION BY o_year) AS DOUBLE) AS share
  FROM nat_year
)
SELECT a.n_name, round(a.share, 6) AS share_1996, round(b.share, 6) AS share_1997
FROM (SELECT * FROM shares WHERE o_year = 1996) a
JOIN (SELECT * FROM shares WHERE o_year = 1997) b ON a.n_name = b.n_name
WHERE b.share > a.share
"""


@register("tpcds_q_share_shift", _SHARE_SHIFT_ORACLE)
def tpcds_q_share_shift(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    nat_year = (orders
                .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
                .filter(F.col("o_year").isin(1996, 1997))
                .join(cust, orders.o_custkey == cust.c_custkey)
                .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
                .groupBy("n_name", "o_year")
                .agg(F.sum(money("o_totalprice")).alias("rev")))
    w = Window.partitionBy("o_year")
    shares = nat_year.withColumn(
        "share", F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"))
    a = shares.filter(F.col("o_year") == 1996).alias("a")
    b = shares.filter(F.col("o_year") == 1997).alias("b")
    return (a.join(b, F.col("a.n_name") == F.col("b.n_name"))
            .filter(F.col("b.share") > F.col("a.share"))
            .select(F.col("a.n_name").alias("n_name"),
                    F.round(F.col("a.share"), 6).alias("share_1996"),
                    F.round(F.col("b.share"), 6).alias("share_1997")))


# --------------------------------------------------------------------------
# q80 family: LEFT-JOIN netting — monthly gross revenue from orders minus
# the month's returned-lineitem revenue (absent months net the full
# gross via COALESCE).  Subtraction stays in exact decimals until the
# final DOUBLE cast.
# --------------------------------------------------------------------------
_NET_RETURNS_ORACLE = """
WITH gross AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS gross_rev
  FROM orders GROUP BY o_year, o_month
), ret AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ret_rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_year, o_month
)
SELECT g.o_year, g.o_month,
       CAST(g.gross_rev AS DOUBLE) AS gross_revenue,
       CAST(g.gross_rev - COALESCE(r.ret_rev, CAST(0 AS DECIMAL(18,2)))
            AS DOUBLE) AS net_revenue
FROM gross g LEFT JOIN ret r ON g.o_year = r.o_year AND g.o_month = r.o_month
"""


@register("tpcds_q_net_minus_returns", _NET_RETURNS_ORACLE)
def tpcds_q_net_minus_returns(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ym = [F.year("o_orderdate").cast("bigint").alias("o_year"),
          F.month("o_orderdate").cast("bigint").alias("o_month")]
    gross = orders.groupBy(*ym).agg(F.sum(money("o_totalprice")).alias("gross_rev"))
    ret = (li.filter(F.col("l_returnflag") == "R")
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .groupBy(*ym).agg(F.sum(money("l_extendedprice")).alias("ret_rev")))
    g = gross.alias("g")
    r = ret.alias("r")
    return (g.join(r, (F.col("g.o_year") == F.col("r.o_year"))
                   & (F.col("g.o_month") == F.col("r.o_month")), "left")
            .select(F.col("g.o_year").alias("o_year"),
                    F.col("g.o_month").alias("o_month"),
                    F.col("gross_rev").cast("double").alias("gross_revenue"),
                    (F.col("gross_rev")
                     - F.coalesce(F.col("ret_rev"), F.lit(0).cast(MONEY)))
                    .cast("double").alias("net_revenue")))


# --------------------------------------------------------------------------
# q47 mechanics: lag-based decline detection — months whose revenue fell
# below the previous month within the same year (LAG over a partitioned
# ordered window on a pre-aggregated series).
# --------------------------------------------------------------------------
_MOM_DECLINE_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_year, o_month
)
SELECT o_year, o_month, rev,
       prev_rev
FROM (SELECT o_year, o_month, rev,
             lag(rev) OVER (PARTITION BY o_year ORDER BY o_month) AS prev_rev
      FROM monthly)
WHERE prev_rev IS NOT NULL AND rev < prev_rev
"""


@register("tpcds_q_mom_decline", _MOM_DECLINE_ORACLE)
def tpcds_q_mom_decline(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    monthly = (orders.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                              F.month("o_orderdate").cast("bigint").alias("o_month"))
               .agg(dsum("o_totalprice", "rev")))
    w = Window.partitionBy("o_year").orderBy("o_month")
    return (monthly.withColumn("prev_rev", F.lag("rev").over(w))
            .filter(F.col("prev_rev").isNotNull()
                    & (F.col("rev") < F.col("prev_rev"))))


# --------------------------------------------------------------------------
# q5 family: independent-dimension GROUPING SETS — one pass producing a
# by-nation report AND a by-segment report (not a hierarchy: neither set
# contains the other), labeled by GROUPING().
# --------------------------------------------------------------------------
_GS_CHANNELS_ORACLE = """
SELECT COALESCE(n_name, 'ALL') AS n_name,
       COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
       CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
"""


@register("tpcds_q_grouping_sets_channels", _GS_CHANNELS_ORACLE)
def tpcds_q_grouping_sets_channels(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    star = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey))
    star.createOrReplaceTempView("_tpcds_gs_star")
    return spark.sql("""
        SELECT COALESCE(n_name, 'ALL') AS n_name,
               COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
               CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM _tpcds_gs_star
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
    """)


# ==========================================================================
# Fourth wave: correlated-fact comparison (q17/q32), market-share
# conditional ratio (q8), and percentage-of-group report (q85 tail).
# ==========================================================================

# --------------------------------------------------------------------------
# q17/q32 family: fact rows compared against their OWN group's average —
# revenue from lineitems whose quantity is below half their part's
# average quantity.  The per-part average decorrelates into an aggregate
# joined back to the fact (AQE picks broadcast when it fits).
# --------------------------------------------------------------------------
_BELOW_AVG_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part_avg USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""


@register("tpcds_q_below_avg_quantity", _BELOW_AVG_ORACLE)
def tpcds_q_below_avg_quantity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part_avg = (li.groupBy("l_partkey")
                .agg((F.sum(money("l_quantity")).cast("double")
                      / F.count(F.lit(1))).alias("avg_qty")))
    return (li.join(part_avg, "l_partkey")
            .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum("l_extendedprice", "revenue")))


# --------------------------------------------------------------------------
# q8 family: market share — one nation's fraction of its region's yearly
# revenue, computed as a conditional share inside ONE aggregation pass
# over the region-filtered star (no second scan for the denominator).
# --------------------------------------------------------------------------
_MARKET_SHARE_ORACLE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_1'
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS region_rev,
       round(CAST(SUM(CASE WHEN n_name = 'NATION_1'
                           THEN CAST(o_totalprice AS DECIMAL(18,2))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS mkt_share
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
GROUP BY o_year
"""


@register("tpcds_q_market_share", _MARKET_SHARE_ORACLE)
def tpcds_q_market_share(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast(MONEY)
    star = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    nat = F.sum(F.when(F.col("n_name") == "NATION_1",
                       money("o_totalprice")).otherwise(zero))
    tot = F.sum(money("o_totalprice"))
    return (star.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(nat.cast("double").alias("nation_rev"),
                 tot.cast("double").alias("region_rev"),
                 F.round(nat.cast("double") / tot.cast("double"), 6)
                 .alias("mkt_share")))


# --------------------------------------------------------------------------
# q85 tail shape: percentage-of-group report — share of high-value
# orders within each order priority, a conditional-count ratio.
# --------------------------------------------------------------------------
_PCT_REPORT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS BIGINT) AS n_high,
       round(COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS high_pct
FROM orders GROUP BY o_orderpriority
"""


@register("tpcds_q_high_value_pct", _PCT_REPORT_ORACLE)
def tpcds_q_high_value_pct(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    high = F.count(F.when(F.col("o_totalprice") > 200000, 1))
    return (orders.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 high.alias("n_high"),
                 F.round(high / F.count(F.lit(1)).cast("double"), 6)
                 .alias("high_pct")))


# ==========================================================================
# Fifth wave: month-pivot wide report (q66), union + per-channel rank
# (q49), zero-fill LEFT-JOIN histogram (q13), semi-join cohort stats
# (q35).
# ==========================================================================

# --------------------------------------------------------------------------
# q66 family: months pivoted into columns — one wide row per nation with
# per-quarter revenue columns from a single conditional aggregation pass
# (the columnar "sales by period" report).
# --------------------------------------------------------------------------
_MONTH_PIVOT_ORACLE = """
SELECT n_name,
       CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 1 AND 3
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q1_rev,
       CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 4 AND 6
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q2_rev,
       CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 7 AND 9
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q3_rev,
       CAST(SUM(CASE WHEN month(o_orderdate) BETWEEN 10 AND 12
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q4_rev
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("tpcds_q_quarter_pivot", _MONTH_PIVOT_ORACLE)
def tpcds_q_quarter_pivot(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    zero = F.lit(0).cast(MONEY)
    m = F.month("o_orderdate")

    def quarter(lo, hi, alias):
        return (F.sum(F.when(m.between(lo, hi), money("o_totalprice"))
                      .otherwise(zero)).cast("double").alias(alias))

    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(quarter(1, 3, "q1_rev"), quarter(4, 6, "q2_rev"),
                 quarter(7, 9, "q3_rev"), quarter(10, 12, "q4_rev")))


# --------------------------------------------------------------------------
# q49 family: union of two channel facts, rank WITHIN each channel, top 5
# per channel — union + partitioned rank in one report.
# --------------------------------------------------------------------------
_UNION_RANK_ORACLE = """
WITH per_chan AS (
  SELECT 'fulfilled' AS channel, c_mktsegment,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus = 'F' GROUP BY c_mktsegment
  UNION ALL
  SELECT 'open' AS channel, c_mktsegment,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderstatus = 'O' GROUP BY c_mktsegment
)
SELECT channel, c_mktsegment, CAST(rev AS DOUBLE) AS revenue,
       CAST(rank() OVER (PARTITION BY channel ORDER BY rev DESC, c_mktsegment)
            AS BIGINT) AS rk
FROM per_chan
QUALIFY rk <= 3
"""


@register("tpcds_q_union_rank_channels", _UNION_RANK_ORACLE)
def tpcds_q_union_rank_channels(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def chan(status, label):
        return (orders.filter(F.col("o_orderstatus") == status)
                .join(cust, orders.o_custkey == cust.c_custkey)
                .groupBy("c_mktsegment")
                .agg(F.sum(money("o_totalprice")).alias("rev"))
                .select(F.lit(label).alias("channel"), "c_mktsegment", "rev"))

    per_chan = chan("F", "fulfilled").unionByName(chan("O", "open"))
    w = Window.partitionBy("channel").orderBy(F.desc("rev"), "c_mktsegment")
    return (per_chan.withColumn("rk", F.rank().over(w).cast("bigint"))
            .filter(F.col("rk") <= 3)
            .select("channel", "c_mktsegment",
                    F.col("rev").cast("double").alias("revenue"), "rk"))


# --------------------------------------------------------------------------
# q13 family: zero-fill histogram — the distribution of order counts per
# customer INCLUDING zero-order customers (LEFT JOIN + COALESCE before
# the second aggregation).
# --------------------------------------------------------------------------
_ZERO_FILL_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
  FROM customer LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
  ) o ON c_custkey = o_custkey
)
SELECT CAST(n_orders AS BIGINT) AS n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY n_orders
"""


@register("tpcds_q_order_count_histogram", _ZERO_FILL_ORACLE)
def tpcds_q_order_count_histogram(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    cnt = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left")
            .select(F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_orders"))
            .groupBy("n_orders")
            .agg(F.count(F.lit(1)).alias("n_customers")))


# --------------------------------------------------------------------------
# q35 family: cohort stats — balance statistics (count, exact-decimal
# avg, min, max) per segment for customers with 1997 activity (semi
# join), the "profile the active cohort" report.
# --------------------------------------------------------------------------
_COHORT_STATS_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_active,
       round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_bal,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c_custkey AND year(o.o_orderdate) = 1997)
GROUP BY c_mktsegment
"""


@register("tpcds_q_cohort_stats", _COHORT_STATS_ORACLE)
def tpcds_q_cohort_stats(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    active = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return (cust.join(active, cust.c_custkey == active.o_custkey, "left_semi")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.round(F.sum(money("c_acctbal")).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_bal"),
                 F.min("c_acctbal").cast("double").alias("min_bal"),
                 F.max("c_acctbal").cast("double").alias("max_bal")))


# ==========================================================================
# Sixth wave: time-hierarchy rollup, snowflake detail join, and the
# frequent-items two-phase filter.
# ==========================================================================

# --------------------------------------------------------------------------
# Time-hierarchy ROLLUP (q27-on-dates): revenue by (year, quarter, month)
# with subtotals at each level of the TIME hierarchy.
# --------------------------------------------------------------------------
_TIME_ROLLUP_ORACLE = """
SELECT CAST(COALESCE(o_year, -1) AS BIGINT) AS o_year,
       CAST(COALESCE(o_quarter, -1) AS BIGINT) AS o_quarter,
       CAST(COALESCE(o_month, -1) AS BIGINT) AS o_month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM (SELECT year(o_orderdate) AS o_year, quarter(o_orderdate) AS o_quarter,
             month(o_orderdate) AS o_month, o_totalprice
      FROM orders)
GROUP BY ROLLUP (o_year, o_quarter, o_month)
"""


@register("tpcds_q_time_hierarchy_rollup", _TIME_ROLLUP_ORACLE)
def tpcds_q_time_hierarchy_rollup(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    derived = orders.select(
        F.year("o_orderdate").alias("o_year"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.month("o_orderdate").alias("o_month"),
        "o_totalprice")
    return (derived.rollup("o_year", "o_quarter", "o_month")
            .agg(dsum("o_totalprice", "revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
            .select(F.coalesce("o_year", F.lit(-1)).cast("bigint").alias("o_year"),
                    F.coalesce("o_quarter", F.lit(-1)).cast("bigint").alias("o_quarter"),
                    F.coalesce("o_month", F.lit(-1)).cast("bigint").alias("o_month"),
                    "revenue", "n_orders"))


# --------------------------------------------------------------------------
# q64 family: wide snowflake detail join — lineitem through part,
# supplier, supplier-nation, orders, customer, customer-nation in one
# plan; the aggregate keys cross both dimension arms (customer nation x
# supplier nation trade-flow matrix).
# --------------------------------------------------------------------------
_SNOWFLAKE_ORACLE = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE p_retailprice > 905
GROUP BY cust_nation, supp_nation
"""


@register("tpcds_q_snowflake_trade_flow", _SNOWFLAKE_ORACLE)
def tpcds_q_snowflake_trade_flow(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 905)
    nation = t(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))
    star = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
            .join(F.broadcast(part), li.l_partkey == part.p_partkey))
    return (star.groupBy("cust_nation", "supp_nation")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum_expr(disc_price(), "volume")))


# --------------------------------------------------------------------------
# q23 head: frequent items — parts bought in more than N orders overall,
# then the monthly revenue restricted to those parts (broadcast semi
# join of the frequent-item set back onto the fact).
# --------------------------------------------------------------------------
_FREQ_ITEMS_ORACLE = """
WITH freq AS (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 30
)
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT l_partkey FROM freq)
GROUP BY o_year, o_month
"""


@register("tpcds_q_frequent_items_revenue", _FREQ_ITEMS_ORACLE)
def tpcds_q_frequent_items_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    freq = (li.groupBy("l_partkey")
            .agg(F.countDistinct("l_orderkey").alias("cnt"))
            .filter(F.col("cnt") > 30).select("l_partkey"))
    return (li.join(F.broadcast(freq), "l_partkey", "left_semi")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                     F.month("o_orderdate").cast("bigint").alias("o_month"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum("l_extendedprice", "revenue")))


# ==========================================================================
# Seventh wave: NOT IN decorrelation, GROUPING()-filtered subtotal rows,
# date-arithmetic aging buckets, and a reused-CTE chain.
# ==========================================================================

# --------------------------------------------------------------------------
# NOT IN -> anti join decorrelation (the q16/q69 sub-mechanic on its
# own): customers with no 1996 order, counted by nation.  (o_custkey is
# non-null, so NOT IN and NOT EXISTS coincide — the difference only
# matters under nullable keys, which the schema rules out.)
# --------------------------------------------------------------------------
_NOT_IN_ORACLE = """
SELECT n_name, COUNT(*) AS n_inactive
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE year(o_orderdate) = 1996)
GROUP BY n_name
"""


@register("tpcds_q_not_in_inactive", _NOT_IN_ORACLE)
def tpcds_q_not_in_inactive(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    active96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return (cust.join(active96, cust.c_custkey == active96.o_custkey, "left_anti")
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name").agg(F.count(F.lit(1)).alias("n_inactive")))


# --------------------------------------------------------------------------
# Subtotal-row extraction: ROLLUP report filtered with GROUPING() so only
# the per-region subtotal and grand-total lines remain (the "summary
# rows only" variant of the q27/q36 family).
# --------------------------------------------------------------------------
_SUBTOTALS_ORACLE = """
SELECT COALESCE(r_name, 'TOTAL') AS region_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
HAVING GROUPING(n_name) = 1
"""


@register("tpcds_q_rollup_subtotals_only", _SUBTOTALS_ORACLE)
def tpcds_q_rollup_subtotals_only(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    star = (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (star.rollup("r_name", "n_name")
            .agg(dsum("o_totalprice", "revenue"),
                 F.grouping("n_name").alias("_gn"))
            .filter(F.col("_gn") == 1)
            .select(F.coalesce("r_name", F.lit("TOTAL")).alias("region_name"),
                    "revenue"))


# --------------------------------------------------------------------------
# Aging buckets: orders bucketed by age (days between order date and the
# corpus watermark date) — the receivables-aging report mechanic.
# --------------------------------------------------------------------------
_AGING_ORACLE = """
SELECT CASE WHEN age_days < 180 THEN '0-179'
            WHEN age_days < 365 THEN '180-364'
            WHEN age_days < 730 THEN '365-729'
            ELSE '730+' END AS age_bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM (SELECT o_totalprice,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02')
               AS age_days
      FROM orders)
GROUP BY age_bucket
"""


@register("tpcds_q_aging_buckets", _AGING_ORACLE)
def tpcds_q_aging_buckets(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    age = F.datediff(F.lit("1998-08-02").cast("date"),
                     F.col("o_orderdate").cast("date"))
    bucket = (F.when(age < 180, "0-179")
              .when(age < 365, "180-364")
              .when(age < 730, "365-729")
              .otherwise("730+"))
    return (orders.select(bucket.alias("age_bucket"), "o_totalprice")
            .groupBy("age_bucket")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice", "revenue")))


# --------------------------------------------------------------------------
# Reused-CTE chain (q95 mechanic / SubplanReuseTest): the monthly
# aggregate feeds BOTH the average subquery and the final join.  The
# DataFrame is bound once, which makes the subplans identical and
# exchange reuse *possible*; whether Catalyst/AQE reuses or recomputes
# is a cost call (at this size it recomputes the cheap agg — at scale,
# identical subtrees over a large fact are where ReuseExchange pays).
# --------------------------------------------------------------------------
_CTE_REUSE_ORACLE = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY o_year, o_month
), avg_rev AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS a FROM monthly
)
SELECT o_year, o_month, CAST(rev AS DOUBLE) AS revenue,
       round(a, 6) AS avg_monthly
FROM monthly CROSS JOIN avg_rev
WHERE CAST(rev AS DOUBLE) > a
"""


@register("tpcds_q_cte_reuse_above_avg", _CTE_REUSE_ORACLE)
def tpcds_q_cte_reuse_above_avg(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    monthly = (orders.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"),
                              F.month("o_orderdate").cast("bigint").alias("o_month"))
               .agg(F.sum(money("o_totalprice")).alias("rev")))
    avg_rev = monthly.agg((F.sum("rev").cast("double")
                           / F.count(F.lit(1))).alias("a"))
    return (monthly.crossJoin(F.broadcast(avg_rev))
            .filter(F.col("rev").cast("double") > F.col("a"))
            .select("o_year", "o_month",
                    F.col("rev").cast("double").alias("revenue"),
                    F.round("a", 6).alias("avg_monthly")))
