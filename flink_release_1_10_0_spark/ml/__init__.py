"""ML Pipeline API analog (reference ``flink-ml-parent``)."""
