"""Dump the formatted physical plan of any registered query.

Usage: python tools/explain.py <query_name> [sf_dir]

The 100 TB review loop: run this after changing a query and check that
filters are pushed (PushedFilters), columns pruned (ReadSchema), small
dims broadcast (BroadcastExchange), and the hot path is codegen'd
(``*(n)`` markers) with no Python eval in relational plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_release_1_10_0_spark.queries import all_queries
from flink_release_1_10_0_spark.session import get_spark


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("explain")
    df = all_queries()[name](spark, sf_dir)
    df.explain(mode="formatted")


if __name__ == "__main__":
    main()
