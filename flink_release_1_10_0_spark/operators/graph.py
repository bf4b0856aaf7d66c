"""Graph operators (Gelly subset, SURVEY.md §2.11).

Reference: ``flink-libraries/flink-gelly/.../graph/Graph.java`` (vertex/
edge DataSets, degrees, library algorithms
``.../graph/library/ConnectedComponents.java``) and the scatter-gather /
vertex-centric iteration models (``.../graph/spargel/``, ``.../pregel/``).

Spark-first shape: a graph is two DataFrames (vertices, edges).
Iterative algorithms run as a driver loop of joins — each superstep is
one Catalyst-planned join+aggregate, the standard Pregel-on-DataFrames
layout (GraphFrames does the same).  The driver holds only a convergence
flag per superstep, never data.

Scale notes: each superstep shuffles edges by src — at 100 TB, persist
the frontier, checkpoint every ~10 supersteps to cut lineage, and stop
on a convergence count.  Label propagation converges in O(diameter)
supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex in/out/total degree (Graph.java inDegrees/outDegrees)."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (out_d.join(in_d, "id", "full_outer")
            .select("id",
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
            .withColumn("degree", F.col("out_degree") + F.col("in_degree")))


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 50) -> DataFrame:
    """Connected components by min-label propagation
    (``library/ConnectedComponents.java`` semantics): every vertex ends
    with component = min vertex id reachable from it.  Returns (id,
    component).

    Each superstep: component(v) := min(component(v), min over neighbors
    of component(n)).  Convergence when no label changes.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .distinct())
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("component", F.col("id")))
    sym = sym.persist()
    labels = labels.persist()
    for _ in range(max_iterations):
        neighbor_min = (sym.join(labels, sym.b == labels.id)
                        .groupBy(F.col("a").alias("id"))
                        .agg(F.min("component").alias("nbr_min")))
        new_labels = (labels.join(neighbor_min, "id", "left_outer")
                      .select("id",
                              F.least(F.col("component"),
                                      F.coalesce("nbr_min", F.col("component")))
                              .alias("component"))
                      .persist())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.expr("n.component <> o.component"))
                   .limit(1).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
