"""Bounded source/sink formats (SURVEY.md §2.1).

Reference inventory -> Spark mapping:

- CSV (``flink-formats/flink-csv/.../CsvRowDeserializationSchema.java``)
  -> ``spark.read.csv`` with explicit schema or header inference.
- JSON (``flink-formats/flink-json/.../JsonRowDeserializationSchema.java:77``)
  -> ``spark.read.json`` / ``from_json`` for embedded payloads.
- Text (``StreamExecutionEnvironment.java:1072`` readTextFile)
  -> ``spark.read.text``.
- Parquet (``flink-formats/flink-parquet/.../ParquetInputFormat.java``)
  and ORC (``flink-formats/flink-orc/.../OrcColumnarRowSplitReader.java``)
  -> native vectorized readers; pushdown (``FilterableTableSource`` /
  ``ProjectableTableSource``) comes from Catalyst + DSv2 for free.

All readers return plain DataFrames so every downstream operator works
unchanged.  Writers default to snappy parquet; ``partition_by`` maps the
reference's partitioned-sink interface (``PartitionableTableSink.java``)
onto hive-style directory partitioning, the layout that enables
partition pruning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None,
             header: bool = True, delimiter: str = ",") -> DataFrame:
    reader = (spark.read.option("header", str(header).lower())
              .option("delimiter", delimiter))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """One row per line, column ``value`` (readTextFile analog)."""
    return spark.read.text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_avro(spark: SparkSession, path: str,
              schema: str | None = None) -> DataFrame:
    """Avro (``flink-formats/flink-avro/.../AvroRowDeserializationSchema.java:79``).

    Prefers the JVM ``spark-avro`` reader when the package is on the
    classpath; otherwise falls back to the pure-Python container codec
    (``avro_py.py`` — binaryFile scan + mapInPandas decode, file-level
    parallelism).  The fallback needs an explicit ``schema`` so planning
    stays scan-free."""
    try:
        return spark.read.format("avro").load(path)
    except Exception:
        if schema is None:
            raise NotImplementedError(
                "spark-avro is not on the classpath; the pure-Python "
                "fallback needs an explicit schema: read_avro(spark, path, "
                "schema='col type, ...')")
        from flink_release_1_10_0_spark.sources.avro_py import read_avro_pure
        return read_avro_pure(spark, path, schema)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JVM spark-avro writer when available, else the pure-Python
    container encoder (one file per partition)."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception:
        import shutil
        if mode == "overwrite":
            shutil.rmtree(path, ignore_errors=True)
        from flink_release_1_10_0_spark.sources.avro_py import write_avro_pure
        write_avro_pure(df, path)


def write_sequence_file(df: DataFrame, path: str, key_col: str,
                        value_cols: list[str]) -> None:
    """Hadoop SequenceFile sink (``flink-formats/flink-sequence-file/.../
    SequenceFileWriterFactory.java`` — the reference writes
    ``SequenceFile<K extends Writable, V extends Writable>``).

    Spark has no DataFrame SequenceFile writer, so this is one of the
    sanctioned RDD drops: key = the key column, value = a JSON Text
    payload of the value columns (``to_json(struct(...))`` — schema-driven
    and null-safe, unlike positional joins).  The write stays fully
    distributed (``saveAsSequenceFile`` per partition)."""
    from pyspark.sql import functions as F

    kv = df.select(key_col, F.to_json(F.struct(*value_cols)).alias("__v"))
    kv.rdd.map(tuple).saveAsSequenceFile(path)


def read_sequence_file(spark: SparkSession, path: str, key_field: str,
                       value_schema: str,
                       key_type: str = "bigint") -> DataFrame:
    """SequenceFile source (``SequenceFileWriterFactory.java`` round-trip
    counterpart): keys + JSON Text values back to typed columns via
    ``from_json`` with an EXPLICIT schema (never inference).  The key is
    explicit-schema too: ``key_type`` (default bigint) must match the
    Writable the writer produced — write_sequence_file accepts any key
    column, so a string- or int-keyed file reads back with
    ``key_type='string'`` / ``'int'`` instead of a mis-cast."""
    from pyspark.sql import functions as F

    rdd = spark.sparkContext.sequenceFile(path)
    df = spark.createDataFrame(rdd, f"{key_field} {key_type}, __v string")
    return df.select(
        key_field,
        F.from_json("__v", value_schema).alias("__s")).select(
        key_field, "__s.*")


def write_text(df: DataFrame, path: str, mode: str = "overwrite",
               compression: str | None = None) -> None:
    """Text sink, optionally compressed (``flink-formats/flink-compress/
    .../CompressWriterFactory.java`` — the reference wraps bulk writers
    in a Hadoop CompressionCodec; Spark's text writer takes the codec
    directly).  ``compression``: gzip | bzip2 | lz4 | snappy | none."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)
