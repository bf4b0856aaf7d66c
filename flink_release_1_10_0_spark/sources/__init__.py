"""Sources, sinks, and formats (SURVEY.md §2.1)."""

from flink_release_1_10_0_spark.sources.formats import (  # noqa: F401
    read_csv, read_json, read_orc, read_parquet, read_text,
    write_csv, write_json, write_parquet,
)
from flink_release_1_10_0_spark.sources.streams import (  # noqa: F401
    file_monitor_source, rate_source, socket_source,
    file_sink, foreach_batch_sink, memory_sink,
)
