from flink_release_1_10_0_spark.functions.registry import register_flink_functions

__all__ = ["register_flink_functions"]
