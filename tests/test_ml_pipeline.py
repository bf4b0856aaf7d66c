"""ML Pipeline API semantics (ml/pipeline.py, Pipeline.java:80-241):
appendStage validation, needFit, the fit-walk, the transform refusal,
JSON persistence, nested pipelines, and stage correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.ml.pipeline import (
    Estimator, Model, Params, Pipeline, PipelineStage, Transformer)
from flink_release_1_10_0_spark.ml.stages import (
    KMeans, StandardScaler, VectorAssembler)
from tests.conftest import compare_query


@pytest.mark.parametrize("name", [
    "ml_pipeline_scaler_kmeans",
    "ml_pipeline_assembler_scaler",
    "ml_pipeline_json_roundtrip",
])
def test_ml_pipeline_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_append_stage_rejects_non_stage_kinds(spark):
    class NotAStage(PipelineStage):
        pass
    with pytest.raises(TypeError, match="Estimator or Transformer"):
        Pipeline([NotAStage()])


def test_need_fit_and_transform_refusal(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id bigint, a double, b double")
    asm = VectorAssembler(input_cols=["a", "b"], output_col="fv")
    p_t = Pipeline([asm])
    assert not p_t.need_fit()          # Transformer-only pipeline
    assert p_t.transform(df).columns[-1] == "fv"

    p_e = Pipeline([asm, StandardScaler(vec_col="fv")])
    assert p_e.need_fit()
    with pytest.raises(RuntimeError, match="need to fit first"):
        p_e.transform(df)              # Pipeline.java:199-201


def test_fit_replaces_estimators_with_models(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(10 - i)) for i in range(10)],
        "id bigint, a double, b double")
    pipe = Pipeline([VectorAssembler(input_cols=["a", "b"], output_col="fv"),
                     StandardScaler(vec_col="fv", output_col="z")])
    fitted = pipe.fit(df)
    assert not fitted.need_fit()
    assert isinstance(fitted.stages[0], Transformer)
    assert isinstance(fitted.stages[1], Model)
    # original pipeline unchanged (fit returns a NEW pipeline)
    assert pipe.need_fit() and isinstance(pipe.stages[1], Estimator)
    out = fitted.transform(df)
    # per-position mean of z is ~0 after standardization
    zbar = out.select(F.avg(F.element_at("z", 1))).first()[0]
    assert abs(zbar) < 1e-9


def test_nested_pipeline_needs_fit_propagates(spark):
    inner = Pipeline([StandardScaler(vec_col="fv")])
    outer = Pipeline([VectorAssembler(input_cols=["a"], output_col="fv"),
                      inner])
    assert outer.need_fit()            # isStageNeedFit on sub-pipelines


def test_pipeline_json_roundtrip_refit_equal(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7), float(i % 3)) for i in range(30)],
        "id bigint, a double, b double")
    pipe = Pipeline([VectorAssembler(input_cols=["a", "b"], output_col="fv"),
                     StandardScaler(vec_col="fv", output_col="z"),
                     KMeans(k=2, iterations=2, vec_col="z", id_col="id")])
    js = pipe.to_json()
    back = PipelineStage.from_json(js)
    assert isinstance(back, Pipeline) and back.need_fit()
    assert back.to_json() == js        # persistence is stable
    a = {(r.id, r.cid) for r in pipe.fit(df).transform(df).collect()}
    b = {(r.id, r.cid) for r in back.fit(df).transform(df).collect()}
    assert a == b                      # restored pipeline refits identically


def test_reloaded_frame_backed_models_refuse_gracefully(spark):
    """Frame-backed models persist params only: after from_json,
    transform must raise the documented RuntimeError ('refit or
    rebind'), never an AttributeError (_stats/_cents default to None
    at class level for exactly this reconstruction path)."""
    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(20)],
        "id bigint, fv array<double>")
    scaler = StandardScaler(vec_col="fv", output_col="z").fit(df)
    km = KMeans(k=2, iterations=1, vec_col="fv", id_col="id").fit(df)
    for model, msg in ((scaler, "refit or rebind"),
                       (km, "refit or rebind")):
        back = PipelineStage.from_json(model.to_json())
        with pytest.raises(RuntimeError, match=msg):
            back.transform(df)


def test_params_json_roundtrip():
    p = Params(k=4, cols=["a", "b"], name="x")
    q = Params().load_json(p.to_json())
    assert p == q and q.get("k") == 4 and q.get("missing", 9) == 9


def test_scaler_zero_variance_position_centers_only(spark):
    df = spark.createDataFrame([(1, [5.0, 1.0]), (2, [5.0, 3.0])],
                               "id bigint, fv array<double>")
    model = StandardScaler(vec_col="fv", output_col="z").fit(df)
    rows = {r.id: r.z for r in model.transform(df).collect()}
    assert rows[1][0] == 0.0 and rows[2][0] == 0.0   # centered, not divided
    assert rows[1][1] == -1.0 and rows[2][1] == 1.0  # (x-2)/1


def test_kmeans_model_assigns_new_data(spark):
    # alternate corners so the two smallest ids (the deterministic init
    # centroids) are distinct
    train = spark.createDataFrame(
        [(i, [float(i % 2 == 0), float(i % 2 == 1)]) for i in range(10)],
        "id bigint, fv array<double>")
    model = KMeans(k=2, iterations=2, vec_col="fv", id_col="id").fit(train)
    new = spark.createDataFrame([(100, [1.0, 0.0]), (101, [0.0, 1.0])],
                                "id bigint, fv array<double>")
    out = {r.id: r.cid for r in model.transform(new).collect()}
    assert out[100] != out[101]        # opposite corners, opposite clusters
    assert model.centroids().count() == 2


def test_gaussian_oracle(spark, duck):
    compare_query(spark, duck, "ml_gaussian_mahalanobis")


def test_gaussian_dim3_numpy_path_and_json_persistence(spark):
    """k>2 uses the numpy precision path (LAPACK analog); the fitted
    model's state lives entirely in params, so to_json round-trips the
    FITTED model (unlike frame-backed models)."""
    import math

    from flink_release_1_10_0_spark.ml.stages import MultivariateGaussian

    df = spark.createDataFrame(
        [(float(i % 7), float(i % 3), float(i % 5)) for i in range(60)],
        "a double, b double, c double").selectExpr(
        "array(a, b, c) AS fv")
    model = MultivariateGaussian(vec_col="fv").fit(df)
    back = PipelineStage.from_json(model.to_json())
    a = [r.maha for r in model.transform(df).collect()]
    b = [r.maha for r in back.transform(df).collect()]
    assert a == b
    # mean Mahalanobis distance of the fitted sample == dimension
    # (a standard multivariate-normal identity, exact for the
    # population-covariance fit)
    assert math.isclose(sum(a) / len(a), 3.0, rel_tol=1e-9)
