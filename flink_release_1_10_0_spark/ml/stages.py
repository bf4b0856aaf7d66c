"""Concrete ML pipeline stages, Spark-first.

The reference's 1.10 ``flink-ml-lib`` ships the API skeleton plus shared
plumbing (``common/mapper/Mapper.java``, ``common/linalg``,
``params/shared/colname/HasOutputCol.java`` etc.) but no public
algorithms yet; these stages realize that surface with the engine's own
deterministic operators so pipelines are runnable end to end:

- :class:`VectorAssembler` — columns -> ``array<double>`` feature vector
  (pure projection, ``HasInputCols``/``HasOutputCol`` param shape);
- :class:`StandardScaler` — per-position mean/std fit with exact DECIMAL
  sums (deterministic across engines), map-only transform;
- :class:`KMeans` — the existing broadcast-codebook Lloyd's trainer
  (``llm/similarity.py``), model = the (cid, cvec) codebook, transform =
  one map-side assignment.

Scale notes: every fit is one aggregation (scaler: one posexplode +
(pos)-keyed agg; kmeans: one shuffle per iteration); every transform is
map-only with the model constants broadcast — nothing driver-side, so a
fitted pipeline transforms 100 TB without a single wide dependency
beyond what the estimators themselves need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.ml.pipeline import (
    Estimator, Model, Params, Transformer)

_DEC = "decimal(28,12)"
_DEC2 = "decimal(38,12)"


class VectorAssembler(Transformer):
    """Assemble numeric columns into one ``array<double>`` feature column
    (HasInputCols/HasOutputCol param shape)."""

    def __init__(self, input_cols: list[str] | None = None,
                 output_col: str = "features", params: Params | None = None):
        super().__init__(params=params, input_cols=input_cols or [],
                         output_col=output_col)

    def transform(self, df: DataFrame) -> DataFrame:
        cols = self.params.get("input_cols")
        if not cols:
            raise ValueError("VectorAssembler needs input_cols")
        return df.withColumn(
            self.params.get("output_col"),
            F.array(*[F.col(c).cast("double") for c in cols]))


class StandardScalerModel(Model):
    """Fitted per-position (mean, std); transform is a map-only
    ``zip_with`` — positions with zero variance are centered only."""

    # class-level default: PipelineStage.from_json reconstructs via
    # __new__ + PipelineStage.__init__ (params only), so a reloaded
    # model must land on the documented "refit or rebind" RuntimeError
    # in transform(), not an AttributeError
    _stats: DataFrame | None = None

    def __init__(self, stats: DataFrame | None = None,
                 vec_col: str = "features", output_col: str = "scaled",
                 params: Params | None = None):
        super().__init__(params=params, vec_col=vec_col,
                         output_col=output_col)
        self._stats = stats  # one row: (means array, stds array)

    def transform(self, df: DataFrame) -> DataFrame:
        if self._stats is None:
            raise RuntimeError("StandardScalerModel has no fitted stats "
                               "(models persist params only; refit or "
                               "rebind the stats frame)")
        vec = self.params.get("vec_col")
        out = self.params.get("output_col")
        scaled = (f"zip_with(zip_with({vec}, __mu, (x, m) -> "
                  "cast(x as double) - m), __sd, "
                  "(y, s) -> CASE WHEN s > 0 THEN y / s ELSE y END)")
        return (df.crossJoin(F.broadcast(self._stats))
                .withColumn(out, F.expr(scaled))
                .drop("__mu", "__sd"))


class StandardScaler(Estimator):
    """Fit per-position mean/std over an ``array`` column.

    Determinism contract (so SQL oracles replay it): mean = exact
    DECIMAL(28,12) sum / n; var = DECIMAL(38,12)-summed x² / n − mean²
    (population), std = sqrt(max(var, 0)).
    """

    def __init__(self, vec_col: str = "features",
                 output_col: str = "scaled", params: Params | None = None):
        super().__init__(params=params, vec_col=vec_col,
                         output_col=output_col)

    def fit(self, df: DataFrame) -> StandardScalerModel:
        from flink_release_1_10_0_spark.llm.text import (
            ensure_min_parallelism)
        vec = self.params.get("vec_col")
        # guide §2.5: the posexplode + partial agg is a corpus map pass;
        # a 1-split scan runs it serially (identity at scale)
        ex = (ensure_min_parallelism(df)
              .select(F.posexplode(vec).alias("pos", "x"))
              .withColumn("v", F.col("x").cast("double")))
        stats = (ex.groupBy("pos")
                 .agg((F.sum(F.col("v").cast(_DEC)).cast("double")
                       / F.count("*")).alias("mu"),
                      (F.sum((F.col("v") * F.col("v")).cast(_DEC2))
                       .cast("double") / F.count("*")).alias("m2"))
                 .withColumn("sd", F.sqrt(F.greatest(
                     F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0)))))
        one = stats.agg(
            F.expr("transform(array_sort(collect_list(struct(pos, mu))), "
                   "s -> s.mu)").alias("__mu"),
            F.expr("transform(array_sort(collect_list(struct(pos, sd))), "
                   "s -> s.sd)").alias("__sd"))
        return StandardScalerModel(one.localCheckpoint(eager=False),
                                   vec_col=vec,
                                   output_col=self.params.get("output_col"))


class KMeansModel(Model):
    """Codebook model: transform appends (cid, sqdist) via one broadcast
    map-side assignment (llm/similarity.kmeans_assign)."""

    # see StandardScalerModel._stats: from_json-reconstructed models
    # must hit the graceful RuntimeError, not an AttributeError
    _cents: DataFrame | None = None

    def __init__(self, cents: DataFrame | None = None,
                 vec_col: str = "features", id_col: str = "vec_id",
                 params: Params | None = None):
        super().__init__(params=params, vec_col=vec_col, id_col=id_col)
        self._cents = cents

    def centroids(self) -> DataFrame:
        return self._cents

    def transform(self, df: DataFrame) -> DataFrame:
        from flink_release_1_10_0_spark.llm.similarity import kmeans_assign
        if self._cents is None:
            raise RuntimeError("KMeansModel has no fitted centroids "
                               "(models persist params only; refit or "
                               "rebind the centroid frame)")
        return kmeans_assign(df, self._cents,
                             id_col=self.params.get("id_col"),
                             vec_col=self.params.get("vec_col"))


class KMeans(Estimator):
    """Deterministic Lloyd's trainer (init/ties/update contract in
    llm/similarity.kmeans_train)."""

    def __init__(self, k: int = 4, iterations: int = 3,
                 vec_col: str = "features", id_col: str = "vec_id",
                 params: Params | None = None):
        super().__init__(params=params, k=k, iterations=iterations,
                         vec_col=vec_col, id_col=id_col)

    def fit(self, df: DataFrame) -> KMeansModel:
        from flink_release_1_10_0_spark.llm.similarity import kmeans_train
        cents = kmeans_train(df, k=self.params.get("k"),
                             iterations=self.params.get("iterations"),
                             id_col=self.params.get("id_col"),
                             vec_col=self.params.get("vec_col"))
        return KMeansModel(cents, vec_col=self.params.get("vec_col"),
                           id_col=self.params.get("id_col"))


class MultivariateGaussianModel(Model):
    """Fitted (mean, covariance) distribution; transform appends the
    Mahalanobis distance (the quadratic form of ``logpdf`` in
    ``flink-ml-lib/.../basicstatistic/MultivariateGaussian.java:84`` —
    the data-dependent term, sans the log-det constant).

    The precision (inverse covariance) matrix is computed once on the
    driver from the k x k fitted constants: closed form for k <= 2 (so
    a SQL oracle can replay the exact arithmetic), numpy otherwise
    (reference uses LAPACK the same way).  Scoring is a pure map-side
    expression built from the constants — no join, no shuffle.
    """

    def __init__(self, mean: list | None = None, prec: list | None = None,
                 vec_col: str = "features", output_col: str = "maha",
                 params: Params | None = None):
        super().__init__(params=params, vec_col=vec_col,
                         output_col=output_col, mean=mean, prec=prec)

    def transform(self, df: DataFrame) -> DataFrame:
        mean = self.params.get("mean")
        prec = self.params.get("prec")
        if mean is None or prec is None:
            raise RuntimeError("MultivariateGaussianModel has no fitted "
                               "mean/precision")
        vec = self.params.get("vec_col")
        k = len(mean)
        dx = [f"(CAST(element_at({vec}, {i + 1}) AS DOUBLE) - {mean[i]!r})"
              for i in range(k)]
        # maha = sum_i dx_i * (sum_j prec_ij * dx_j), left-to-right —
        # the exact association a SQL oracle replays
        inner = ["(" + " + ".join(f"({prec[i][j]!r} * {dx[j]})"
                                  for j in range(k)) + ")"
                 for i in range(k)]
        maha = " + ".join(f"({dx[i]} * {inner[i]})" for i in range(k))
        return df.withColumn(self.params.get("output_col"), F.expr(maha))


class MultivariateGaussian(Estimator):
    """Fit a multivariate Gaussian over an ``array`` column
    (``MultivariateGaussian.java:36`` — there the distribution is
    constructed from given (mean, cov); here the estimator also FITS
    them, population moments via exact DECIMAL sums so oracles replay
    the fit bit-for-bit)."""

    def __init__(self, vec_col: str = "features",
                 output_col: str = "maha", params: Params | None = None):
        super().__init__(params=params, vec_col=vec_col,
                         output_col=output_col)

    def fit(self, df: DataFrame) -> MultivariateGaussianModel:
        vec = self.params.get("vec_col")
        k = df.select(F.size(vec).alias("k")).first()["k"]
        x = [f"CAST(element_at({vec}, {i + 1}) AS DOUBLE)" for i in range(k)]
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(k):
            aggs.append(F.expr(f"sum(CAST({x[i]} AS {_DEC}))")
                        .cast("double").alias(f"s{i}"))
        for i in range(k):
            for j in range(i, k):
                aggs.append(F.expr(
                    f"sum(CAST({x[i]} * {x[j]} AS {_DEC2}))")
                    .cast("double").alias(f"p{i}_{j}"))
        row = df.agg(*aggs).first()
        n = float(row["n"])
        mean = [row[f"s{i}"] / n for i in range(k)]
        cov = [[0.0] * k for _ in range(k)]
        for i in range(k):
            for j in range(i, k):
                c = row[f"p{i}_{j}"] / n - mean[i] * mean[j]
                cov[i][j] = cov[j][i] = c
        if k == 1:
            prec = [[1.0 / cov[0][0]]]
        elif k == 2:
            # closed form, same arithmetic shape as the SQL oracle
            det = cov[0][0] * cov[1][1] - cov[0][1] * cov[0][1]
            prec = [[cov[1][1] / det, -cov[0][1] / det],
                    [-cov[0][1] / det, cov[0][0] / det]]
        else:
            import numpy as np
            prec = np.linalg.inv(np.array(cov)).tolist()
        return MultivariateGaussianModel(
            mean=mean, prec=prec, vec_col=vec,
            output_col=self.params.get("output_col"))
