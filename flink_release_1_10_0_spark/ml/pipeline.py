"""ML Pipeline API: Estimator / Transformer / Model / Pipeline / Params.

Reference (``flink-ml-parent/flink-ml-api/src/main/java/org/apache/flink/
ml/api/``):

- ``core/PipelineStage.java`` — a stage carries Params and JSON
  persistence (``toJson``/``loadJson``);
- ``core/Transformer.java`` / ``core/Model.java`` / ``core/Estimator.java``
  — ``transform(tEnv, table) -> table`` and ``fit(tEnv, table) -> Model``;
- ``core/Pipeline.java:80-210`` — ``appendStage`` validates stage kinds and
  tracks the last estimator index; ``needFit`` is true iff the pipeline
  contains an (unfitted) Estimator; ``fit`` walks stages up to the last
  estimator, fitting estimators and transforming the running table, and
  returns a NEW pipeline with estimators replaced by their Models
  (stages after the last estimator are carried as-is); ``transform``
  refuses when ``needFit`` ("Pipeline contains Estimator, need to fit
  first.");
- ``misc/param/Params.java`` — a typed param map with JSON round-trip.

Spark-first shape: a "Table" is a DataFrame; stages build lazy DataFrame
plans, so a fitted pipeline's ``transform`` is one Catalyst plan end to
end (scaler expressions + broadcast codebook assignment fuse into the
same stage pipeline — no materialization between stages).  Model state
(means, centroids) lives in small DataFrames the stage broadcasts, never
on the driver beyond the fitted constants.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


class Params:
    """Typed param map (``misc/param/Params.java``): set/get with a
    default, JSON round-trip via ``to_json``/``load_json``."""

    def __init__(self, **kv):
        self._map: dict = dict(kv)

    def set(self, name: str, value) -> "Params":
        self._map[name] = value
        return self

    def get(self, name: str, default=None):
        return self._map.get(name, default)

    def to_json(self) -> str:
        return json.dumps(self._map, sort_keys=True)

    def load_json(self, s: str) -> "Params":
        self._map = json.loads(s)
        return self

    def __eq__(self, other):
        return isinstance(other, Params) and self._map == other._map

    def __repr__(self):
        return f"Params({self._map})"


# class-name -> class, for loadJson reconstruction
# (Pipeline.java:263 restoreInnerStage instantiates by stored class name)
_STAGE_REGISTRY: dict[str, type] = {}


class PipelineStage:
    """PipelineStage.java: params + JSON persistence."""

    def __init__(self, params: Params | None = None, **kv):
        self.params = params or Params(**kv)

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _STAGE_REGISTRY[cls.__name__] = cls

    def to_json(self) -> str:
        return json.dumps({"stage": type(self).__name__,
                           "params": json.loads(self.params.to_json())},
                          sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "PipelineStage":
        d = json.loads(s)
        cls = _STAGE_REGISTRY.get(d["stage"])
        if cls is None:
            raise ValueError(f"unknown pipeline stage {d['stage']!r}; "
                             f"known: {sorted(_STAGE_REGISTRY)}")
        stage = cls.__new__(cls)
        PipelineStage.__init__(stage, Params(**d["params"]))
        if d["stage"] == "Pipeline":
            stage._init_from_params()
        return stage


class Transformer(PipelineStage):
    """Transformer.java: transform(df) -> df."""

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class Model(Transformer):
    """Model.java: a Transformer produced by an Estimator's fit."""


class Estimator(PipelineStage):
    """Estimator.java: fit(df) -> Model."""

    def fit(self, df: DataFrame) -> Model:
        raise NotImplementedError


class Pipeline(Estimator, Transformer):
    """Pipeline.java: a linear chain of stages, itself usable as an
    Estimator (when it needs fit) or a Transformer (when it doesn't)."""

    def __init__(self, stages: list[PipelineStage] | None = None):
        super().__init__()
        self.stages: list[PipelineStage] = []
        self._last_estimator_index = -1
        for s in (stages or []):
            self.append_stage(s)

    @staticmethod
    def _stage_needs_fit(stage: PipelineStage) -> bool:
        # Pipeline.java:81-84 isStageNeedFit
        if isinstance(stage, Pipeline):
            return stage.need_fit()
        return isinstance(stage, Estimator)

    def append_stage(self, stage: PipelineStage) -> "Pipeline":
        # Pipeline.java:93-102: only Estimator/Transformer/Model/Pipeline
        if self._stage_needs_fit(stage):
            self._last_estimator_index = len(self.stages)
        elif not isinstance(stage, Transformer):
            raise TypeError(
                "All PipelineStages should be Estimator or Transformer, "
                f"got: {type(stage).__name__}")
        self.stages.append(stage)
        return self

    def need_fit(self) -> bool:
        # Pipeline.java:120-123
        return self._last_estimator_index >= 0

    def fit(self, df: DataFrame) -> "Pipeline":
        # Pipeline.java:169-191: fit up to the last estimator inclusive,
        # replace estimators with their models, carry the tail as-is
        out: list[PipelineStage] = []
        for i, s in enumerate(self.stages):
            if i <= self._last_estimator_index:
                t = s.fit(df) if self._stage_needs_fit(s) else s
                out.append(t)
                df = t.transform(df)
            else:
                out.append(s)
        return Pipeline(out)

    def transform(self, df: DataFrame) -> DataFrame:
        # Pipeline.java:199-207
        if self.need_fit():
            raise RuntimeError(
                "Pipeline contains Estimator, need to fit first.")
        for s in self.stages:
            df = s.transform(df)
        return df

    # -- persistence (Pipeline.java:212-241 toJson/loadJson) --
    def to_json(self) -> str:
        return json.dumps(
            {"stage": "Pipeline",
             "params": {"stages": [json.loads(s.to_json())
                                   for s in self.stages]}},
            sort_keys=True)

    def _init_from_params(self):
        self.stages = []
        self._last_estimator_index = -1
        for d in self.params.get("stages", []):
            self.append_stage(PipelineStage.from_json(json.dumps(d)))
        self.params = Params()
