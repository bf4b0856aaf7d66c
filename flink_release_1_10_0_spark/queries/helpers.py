"""Shared helpers for query definitions (see package docstring for the
determinism conventions these implement)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.catalog import load

MONEY = "decimal(18,2)"   # exact for the 2-decimal money columns
MONEY4 = "decimal(28,8)"  # products of two money values


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM of a 2-decimal double column -> DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def dsum_expr(expr: Column, alias: str) -> Column:
    """Order-independent SUM of a decimal expression -> DOUBLE."""
    return F.sum(expr).cast("double").alias(alias)


def money(col: str) -> Column:
    return F.col(col).cast(MONEY)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal arithmetic."""
    return (money("l_extendedprice") * (F.lit(1).cast(MONEY) - money("l_discount"))).cast(MONEY4)


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal arithmetic."""
    return (disc_price() * (F.lit(1).cast(MONEY) + money("l_tax")).cast(MONEY4)).cast(MONEY4)
