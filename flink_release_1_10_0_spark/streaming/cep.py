"""CEP pattern API (``flink-libraries/flink-cep/.../pattern/
Pattern.java:50-542`` subset: begin/where/followedBy/oneOrMore/within)
compiling to the stateful NFA operators in ``streaming/stateful.py``.

Supported pattern shapes (the MATCH_RECOGNIZE core):

- ``Pattern.begin(A).followed_by(B).within(T)`` — each A matches its
  first B inside the window; matched As are consumed.
- ``Pattern.begin(A).one_or_more().followed_by(B).within(T)`` — greedy:
  all pending As inside the window form one match with B.

``where`` conditions are event-type predicates (the keyed-stream layout
the reference's CepOperator runs on); richer per-event predicates can be
pushed as filters before ``match_stream``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class _Stage:
    event_type: str
    one_or_more: bool = False
    negated: bool = False


@dataclass
class Pattern:
    """Fluent pattern builder (two-stage sequences)."""

    stages: list[_Stage] = field(default_factory=list)
    within_minutes: float | None = None

    @classmethod
    def begin(cls, event_type: str) -> "Pattern":
        return cls(stages=[_Stage(event_type)])

    def one_or_more(self) -> "Pattern":
        self.stages[-1].one_or_more = True
        return self

    def followed_by(self, event_type: str) -> "Pattern":
        self.stages.append(_Stage(event_type))
        return self

    def not_followed_by(self, event_type: str) -> "Pattern":
        """Absence pattern (``Pattern.notFollowedBy``): match when no such
        event arrives inside the window (decided on watermark)."""
        self.stages.append(_Stage(event_type, negated=True))
        return self

    def within(self, minutes: float) -> "Pattern":
        self.within_minutes = minutes
        return self

    def match_stream(self, events: DataFrame, key: str = "user_id") -> DataFrame:
        """Compile to the stateful NFA operator; returns the match stream."""
        from flink_release_1_10_0_spark.streaming import stateful

        if len(self.stages) != 2:
            raise NotImplementedError("two-stage sequences (A -> B) supported")
        if self.within_minutes is None:
            raise ValueError("within(minutes) is required (WITHIN clause)")
        a, b = self.stages
        if b.one_or_more:
            raise NotImplementedError("oneOrMore only on the begin stage")
        if b.negated:
            return stateful.cep_not_followed_by(
                events, a.event_type, b.event_type, self.within_minutes, key=key)
        if a.one_or_more:
            return stateful.cep_one_or_more(
                events, a.event_type, b.event_type, self.within_minutes, key=key)
        return stateful.cep_followed_by(
            events, a.event_type, b.event_type, self.within_minutes, key=key)
