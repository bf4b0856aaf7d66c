"""PySpark-native analytics engine with the query/data-processing surface of
Apache Flink 1.10.0 (reference: liuwenbo6688/flink-release-1.10.0).

Architecture (SURVEY.md §7): a thin library over Spark SQL / DataFrame /
Structured Streaming.  The reference's Blink planner + runtime (codegen,
BinaryRow, spill, shuffle) are deliberately NOT rebuilt — Catalyst/Tungsten
provide them (SURVEY.md §4.3).  What this package adds:

- ``TableEnvironment`` / ``Table``: the fluent Table-API shell
  (reference ``flink-table-api-java/.../Table.java:104-911``).
- ``functions``: Flink-named SQL functions registered over Spark built-ins
  (reference ``FlinkSqlOperatorTable.java``).
- ``operators``: relational operators Spark lacks natively (as-of/temporal
  join, interval join, top-N, dedup keep-first/last, sessionization).
- ``streaming``: Structured-Streaming equivalents of the DataStream surface
  (window aggs, watermarks, stateful dedup/top-N).
- ``llm``: large-scale training-data pipeline ops (minhash/simhash dedup,
  ANN similarity, text quality/language-ID, multimodal column plumbing).
"""

from flink_release_1_10_0_spark.session import get_spark
from flink_release_1_10_0_spark.catalog import register_tables, TABLES
from flink_release_1_10_0_spark.environment import TableEnvironment, Table
from flink_release_1_10_0_spark.streaming.datastream import DataStream, KeyedStream
from flink_release_1_10_0_spark.streaming.cep import Pattern
from flink_release_1_10_0_spark.functions.udf import (
    AggregateFunction, ScalarFunction, TableFunction,
)

__all__ = [
    "get_spark", "register_tables", "TABLES", "TableEnvironment", "Table",
    "DataStream", "KeyedStream", "Pattern",
    "ScalarFunction", "TableFunction", "AggregateFunction",
]

__version__ = "0.1.0"
