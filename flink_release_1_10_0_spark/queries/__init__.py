"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` runs the operator through this
engine; ``oracle_sql`` is ANSI SQL DuckDB runs on the same parquet tables.
Column names/types are aligned on both sides (driver hashes values after
sorting columns by name).

Determinism conventions (so value-hashes match bit-for-bit):
- money/quantity aggregates: cast to DECIMAL before SUM (exact, order-
  independent), cast the final result to DOUBLE on both sides;
- derived integers: explicit CAST to BIGINT on both sides (DuckDB's
  year()/count() default to BIGINT);
- float ratios/cosines: identical expression shape on both sides plus
  ROUND(x, 6);
- no DECIMAL / STRUCT / ARRAY output columns (scalar columns only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (fn, oracle_sql | None)   (None => driver does rows-only check)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in _REGISTRY, f"duplicate query name {name}"
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {k: v[0] for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from flink_release_1_10_0_spark.queries import (  # noqa: F401
        tpch, tpch_full, relational, windows, temporal, llm, streaming,  # noqa
        extended,  # noqa
    )
    _LOADED = True
