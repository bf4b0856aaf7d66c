"""ML Pipeline API queries (ml/pipeline.py + ml/stages.py): the
``flink-ml-parent`` Estimator/Transformer/Pipeline surface run end to
end — assemble → scale → cluster — with DuckDB oracles replaying the
exact deterministic fit arithmetic (DECIMAL-summed moments, the
documented k-means init/tie/update contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import t

# ---- shared DuckDB fragments -------------------------------------------

_SQDIST = ("list_sum(list_transform(range(1, 65), i -> "
           "(e.sc[i] - c.cvec[i]) * (e.sc[i] - c.cvec[i])))")


def _asg(name: str, cents: str) -> str:
    return f"""{name} AS (
  SELECT vec_id, sc, cid, sqdist FROM (
    SELECT e.vec_id, e.sc, c.cid, {_SQDIST} AS sqdist,
           min(struct_pack(s := {_SQDIST}, c := c.cid))
             OVER (PARTITION BY e.vec_id) AS b
    FROM sv e CROSS JOIN {cents} c) q
  WHERE sqdist = b.s AND cid = b.c)"""


def _upd_cents(i: int) -> str:
    return f"""upd{i} AS (
  SELECT cid, pos, CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS c
  FROM (SELECT cid, generate_subscripts(sc, 1) AS pos, unnest(sc) AS v
        FROM asg{i}) x
  GROUP BY cid, pos),
cents{i} AS (SELECT cid, list(c ORDER BY pos) AS cvec FROM upd{i}
             GROUP BY cid)"""


def _scaler_kmeans_oracle(k: int, iterations: int) -> str:
    parts = [f"""WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
st AS (
  SELECT pos,
         CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE)
           / COUNT(*) AS m2
  FROM ex GROUP BY pos),
sv AS (
  SELECT vec_id,
         list(CASE WHEN sd > 0 THEN (v - mu) / sd ELSE v - mu END
              ORDER BY pos) AS sc
  FROM (SELECT e.vec_id, e.pos, e.v, st.mu,
               sqrt(greatest(st.m2 - st.mu * st.mu, 0)) AS sd
        FROM ex e JOIN st USING (pos)) q
  GROUP BY vec_id),
cents_init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid,
         sc AS cvec
  FROM (SELECT vec_id, sc FROM sv ORDER BY vec_id LIMIT {k}) q)"""]
    prev = "cents_init"
    for i in range(iterations):
        parts.append(_asg(f"asg{i}", prev))
        parts.append(_upd_cents(i))
        prev = f"cents{i}"
    parts.append(_asg("asg_final", prev))
    return (",\n".join(parts)
            + "\nSELECT vec_id, cid, round(sqdist, 6) AS dist_r "
              "FROM asg_final")


_PIPELINE_KMEANS_ORACLE = _scaler_kmeans_oracle(k=4, iterations=2)


@register("ml_pipeline_scaler_kmeans", _PIPELINE_KMEANS_ORACLE)
def ml_pipeline_scaler_kmeans(spark, sf_dir):
    """Pipeline([StandardScaler, KMeans]).fit(emb).transform(emb) — the
    Pipeline.java fit-walk (estimator -> model -> running table), with the
    fitted pipeline applied back to the full input."""
    from flink_release_1_10_0_spark.ml.pipeline import Pipeline
    from flink_release_1_10_0_spark.ml.stages import KMeans, StandardScaler

    emb = t(spark, sf_dir, "embeddings")
    pipe = Pipeline([
        StandardScaler(vec_col="embedding", output_col="sc"),
        KMeans(k=4, iterations=2, vec_col="sc", id_col="vec_id"),
    ])
    assert pipe.need_fit()
    fitted = pipe.fit(emb)
    assert not fitted.need_fit()
    out = fitted.transform(emb)
    return out.select("vec_id", "cid",
                      F.round(F.col("sqdist"), 6).alias("dist_r"))


_ASSEMBLER_SCALER_ORACLE = """
WITH src AS (
  SELECT event_id, CAST(value AS DOUBLE) AS v1,
         CAST(user_id AS DOUBLE) AS v2
  FROM events WHERE value IS NOT NULL),
st AS (
  SELECT
    CAST(SUM(CAST(v1 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu1,
    CAST(SUM(CAST(v1 * v1 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m21,
    CAST(SUM(CAST(v2 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mu2,
    CAST(SUM(CAST(v2 * v2 AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m22
  FROM src)
SELECT event_id,
       round((v1 - mu1) / sqrt(greatest(m21 - mu1 * mu1, 0)), 6) AS z_value,
       round((v2 - mu2) / sqrt(greatest(m22 - mu2 * mu2, 0)), 6) AS z_user
FROM src CROSS JOIN st
"""


@register("ml_pipeline_assembler_scaler", _ASSEMBLER_SCALER_ORACLE)
def ml_pipeline_assembler_scaler(spark, sf_dir):
    """Transformer-then-Estimator pipeline over relational columns:
    VectorAssembler (pure projection) feeds StandardScaler; the fitted
    pipeline is a Transformer (needFit false — Pipeline.java:120)."""
    from flink_release_1_10_0_spark.ml.pipeline import Pipeline
    from flink_release_1_10_0_spark.ml.stages import (
        StandardScaler, VectorAssembler)

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_id", "value", "user_id"))
    pipe = Pipeline([
        VectorAssembler(input_cols=["value", "user_id"], output_col="fv"),
        StandardScaler(vec_col="fv", output_col="z"),
    ])
    out = pipe.fit(ev).transform(ev)
    return out.select(
        "event_id",
        F.round(F.element_at("z", 1), 6).alias("z_value"),
        F.round(F.element_at("z", 2), 6).alias("z_user"))


# --------------------------------------------------------------------------
# MultivariateGaussian (flink-ml-lib basicstatistic/MultivariateGaussian
# .java:36): fit (mean, cov) over assembled 2-d features, score the
# Mahalanobis quadratic form.  The oracle replays the DECIMAL-summed
# moments, the closed-form 2x2 precision, and the exact left-to-right
# quadratic-form association the model emits.
# --------------------------------------------------------------------------
_GAUSSIAN_ORACLE = """
WITH src AS (
  SELECT event_id, CAST(value AS DOUBLE) AS v1,
         CAST(user_id AS DOUBLE) AS v2
  FROM events WHERE value IS NOT NULL),
m AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(v1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(v2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
    CAST(SUM(CAST(v1 * v1 AS DECIMAL(38,12))) AS DOUBLE) AS p11,
    CAST(SUM(CAST(v1 * v2 AS DECIMAL(38,12))) AS DOUBLE) AS p12,
    CAST(SUM(CAST(v2 * v2 AS DECIMAL(38,12))) AS DOUBLE) AS p22
  FROM src),
c AS (
  SELECT s1 / n AS mu1, s2 / n AS mu2,
         (p11 / n) - ((s1 / n) * (s1 / n)) AS c11,
         (p12 / n) - ((s1 / n) * (s2 / n)) AS c12,
         (p22 / n) - ((s2 / n) * (s2 / n)) AS c22
  FROM m),
e AS (
  SELECT mu1, mu2,
         c22 / ((c11 * c22) - (c12 * c12)) AS e11,
         -c12 / ((c11 * c22) - (c12 * c12)) AS e12,
         c11 / ((c11 * c22) - (c12 * c12)) AS e22
  FROM c)
SELECT event_id,
       round(((v1 - mu1) * ((e11 * (v1 - mu1)) + (e12 * (v2 - mu2))))
             + ((v2 - mu2) * ((e12 * (v1 - mu1)) + (e22 * (v2 - mu2)))),
             6) AS maha_r
FROM src CROSS JOIN e
"""


@register("ml_pipeline_json_roundtrip", _GAUSSIAN_ORACLE)
def ml_pipeline_json_roundtrip(spark, sf_dir):
    """Pipeline JSON persistence round-trip (Pipeline.java:212-241
    toJson/loadJson), oracle-gated end to end: the UNFITTED pipeline is
    serialized and reloaded (stage-registry reconstruction,
    Pipeline.java:263 restoreInnerStage), fit runs through the RELOADED
    estimator chain, the FITTED pipeline is serialized and reloaded
    again, and the final transform runs through that second reload —
    honest persistence, because MultivariateGaussianModel carries its
    entire fitted state (mean, precision) in params.  Frame-backed
    models (scaler stats, k-means centroids) persist params only by
    contract and refuse transform after reload — pytest covers that
    refusal path."""
    from flink_release_1_10_0_spark.ml.pipeline import (
        Pipeline, PipelineStage)
    from flink_release_1_10_0_spark.ml.stages import (
        MultivariateGaussian, VectorAssembler)

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_id", "value", "user_id"))
    pipe = Pipeline([
        VectorAssembler(input_cols=["value", "user_id"], output_col="fv"),
        MultivariateGaussian(vec_col="fv", output_col="maha"),
    ])
    reloaded = PipelineStage.from_json(pipe.to_json())
    assert reloaded.need_fit()
    fitted = reloaded.fit(ev)
    refitted = PipelineStage.from_json(fitted.to_json())
    assert not refitted.need_fit()
    out = refitted.transform(ev)
    return out.select("event_id", F.round("maha", 6).alias("maha_r"))


@register("ml_gaussian_mahalanobis", _GAUSSIAN_ORACLE)
def ml_gaussian_mahalanobis(spark, sf_dir):
    from flink_release_1_10_0_spark.ml.pipeline import Pipeline
    from flink_release_1_10_0_spark.ml.stages import (
        MultivariateGaussian, VectorAssembler)

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_id", "value", "user_id"))
    pipe = Pipeline([
        VectorAssembler(input_cols=["value", "user_id"], output_col="fv"),
        MultivariateGaussian(vec_col="fv", output_col="maha"),
    ])
    out = pipe.fit(ev).transform(ev)
    return out.select("event_id", F.round("maha", 6).alias("maha_r"))
