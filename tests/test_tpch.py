"""TPC-H-style query correctness vs DuckDB oracle at sf0.001 (the driver
runs the same compare at sf0.01). Mirrors the reference's TPC-H e2e
validation (flink-end-to-end-tests/test-scripts/test_tpch.sh)."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_suppliers",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_orders",
    "tpch_q22_sales_opportunity",
]


@pytest.mark.parametrize("name", QUERIES)
def test_tpch_query(spark, duck, name):
    compare_query(spark, duck, name)


def test_entry_contract(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 6


def test_q1_plan_pushdown(spark):
    """Filter must reach the parquet scan (SURVEY §2.1 pushdown parity)."""
    from flink_release_1_10_0_spark.queries import all_queries
    df = all_queries()["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters" in plan
