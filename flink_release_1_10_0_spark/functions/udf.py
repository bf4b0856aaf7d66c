"""User-defined function surface: ScalarFunction / TableFunction /
AggregateFunction (SURVEY.md §2.10).

Reference API: ``flink-table/flink-table-common/.../functions/
ScalarFunction.java``, ``TableFunction.java``, ``AggregateFunction.java``
(accumulate/merge/getValue).  In the reference these run through codegen
(or, for Python, an Apache Beam detour, ``flink-python/pyflink/table/
udf.py:75-240``); here they compile to the native PySpark execution
paths:

- ScalarFunction  -> Arrow-batched ``pandas_udf`` (vectorized, no
  row-at-a-time Python).
- TableFunction   -> ``mapInPandas`` (one input row -> N output rows),
  the lateral/correlate path (``StreamExecCorrelate``).
- AggregateFunction -> ``groupBy().applyInPandas`` (partial frames are
  whole groups per batch; for algebraic aggregates prefer built-ins).

At 100 TB: prefer built-in expressions wherever one exists — these
classes are the escape hatch, and all three route through Arrow so the
Python boundary is batch-columnar, never per-row pickling.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ScalarFunction:
    """Subclass and implement ``eval(self, series…) -> series`` over
    pandas Series (vectorized).  ``result_type`` is a Spark DDL type."""

    result_type: str = "string"

    def eval(self, *cols: pd.Series) -> pd.Series:  # pragma: no cover - interface
        raise NotImplementedError

    def to_pandas_udf(self):
        return F.pandas_udf(self.eval, self.result_type)


class TableFunction:
    """Subclass and implement ``eval(self, row) -> iterable of tuples``.
    ``apply`` runs it laterally over a DataFrame (correlate/UDTF,
    ``StreamExecCorrelate.scala``), carrying ``passthrough`` columns."""

    result_schema: str = "out string"

    def eval(self, row: Any) -> Iterator[tuple]:  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, df: DataFrame, passthrough: list[str]) -> DataFrame:
        out_names = [f.split()[0] for f in self.result_schema.split(",")]
        schema = ", ".join(
            f"{c} {dict(df.dtypes)[c]}" for c in passthrough
        ) + ", " + self.result_schema
        fn_eval = self.eval

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for row in pdf.itertuples(index=False):
                    keys = tuple(getattr(row, c) for c in passthrough)
                    for out in fn_eval(row):
                        rows.append(keys + tuple(out))
                yield pd.DataFrame(rows, columns=passthrough + out_names)

        return df.mapInPandas(run, schema)


class AggregateFunction:
    """Subclass and implement ``get_value(self, pdf) -> dict`` mapping
    output column -> scalar for one group (the accumulate/merge pair
    collapses to one whole-group pandas frame under ``applyInPandas``)."""

    result_schema: str = "value double"

    def get_value(self, pdf: pd.DataFrame) -> dict:  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, df: DataFrame, keys: list[str]) -> DataFrame:
        schema = ", ".join(
            f"{c} {dict(df.dtypes)[c]}" for c in keys
        ) + ", " + self.result_schema
        get_value = self.get_value

        def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = get_value(pdf)
            return pd.DataFrame([dict(zip(keys, key)) | out])

        return df.groupBy(*keys).applyInPandas(run, schema)


def register_sql_table_function(spark, name: str, eval_fn, return_type: str) -> None:
    """SQL-callable Python UDTF (Spark native ``@udtf``): the reference's
    ``TableFunction`` registered for ``SELECT ... FROM tbl, LATERAL fn(...)``
    (``Table.java:476`` joinLateral / ``StreamExecCorrelate``).

    ``eval_fn(value) -> iterable of tuples`` matching ``return_type``.
    """
    from pyspark.sql.functions import udtf

    class _Fn:
        def eval(self, *args):
            yield from eval_fn(*args)

    spark.udtf.register(name, udtf(_Fn, returnType=return_type))
