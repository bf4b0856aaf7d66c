"""CEP pattern API (``flink-libraries/flink-cep/.../pattern/
Pattern.java:50-542`` subset) compiling to the stateful NFA operators in
``streaming/stateful.py``.

Supported pattern shapes (the MATCH_RECOGNIZE core):

- ``Pattern.begin(A).followed_by(B).within(T)`` — each A matches its
  first B inside the window; matched As are consumed.
- ``Pattern.begin(A).next(B)`` — strict contiguity: B must be the
  immediately following event of its key.
- ``Pattern.begin(A).followed_by_any(B).within(T)`` — every in-window
  (A, B) pair matches; no consumption (SKIP TO NEXT).
- ``Pattern.begin(A).one_or_more().followed_by(B).within(T)`` — greedy:
  all pending As inside the window form one match with B.
- ``Pattern.begin(A).times(n).consecutive()`` — n consecutive As with no
  intervening event; SKIP PAST LAST ROW.
- ``Pattern.begin(A).times_or_more(n).followed_by(B).within(T)`` — B
  completes a greedy match only when >= n pending As are in its window;
  consumption happens only on success.
- ``Pattern.begin(A).not_followed_by(B).within(T)`` — absence inside the
  window, decided on watermark.
- ``Pattern.begin(A).followed_by(B).optional().followed_by(C).within(T)``
  — three-stage with optional middle; matches annotate whether B
  occurred between A and C.

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
    strict: bool = False        # next() — no ignore self-loop
    any_match: bool = False     # followedByAny() — no consumption
    optional: bool = False      # optional() — stage may be skipped
    times_n: int | None = None  # times(n)
    or_more: bool = False       # timesOrMore(n)
    consecutive: bool = False


@dataclass
class Pattern:
    """Fluent pattern builder."""

    stages: list[_Stage] = field(default_factory=list)
    within_minutes: float | None = None

    @classmethod
    def begin(cls, event_type: str) -> "Pattern":
        return cls(stages=[_Stage(event_type)])

    def one_or_more(self) -> "Pattern":
        self.stages[-1].one_or_more = True
        return self

    def times(self, n: int) -> "Pattern":
        self.stages[-1].times_n = n
        return self

    def times_or_more(self, n: int) -> "Pattern":
        """At least ``n`` occurrences (``Pattern.timesOrMore``)."""
        self.stages[-1].times_n = n
        self.stages[-1].or_more = True
        return self

    def consecutive(self) -> "Pattern":
        self.stages[-1].consecutive = True
        return self

    def optional(self) -> "Pattern":
        self.stages[-1].optional = True
        return self

    def followed_by(self, event_type: str) -> "Pattern":
        self.stages.append(_Stage(event_type))
        return self

    def followed_by_any(self, event_type: str) -> "Pattern":
        """Relaxed contiguity, non-deterministic runs
        (``Pattern.followedByAny``): every qualifying pair matches."""
        self.stages.append(_Stage(event_type, any_match=True))
        return self

    def next(self, event_type: str) -> "Pattern":
        """Strict contiguity (``Pattern.next``): the very next event."""
        self.stages.append(_Stage(event_type, strict=True))
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

        if len(self.stages) == 1:
            s = self.stages[0]
            if s.times_n and s.consecutive:
                return stateful.cep_times_consecutive(
                    events, s.event_type, n=s.times_n, key=key)
            raise NotImplementedError("single-stage needs times(n).consecutive()")
        if len(self.stages) == 3:
            a, b, c = self.stages
            if b.optional and self.within_minutes is not None:
                return stateful.cep_optional_between(
                    events, a.event_type, b.event_type, c.event_type,
                    self.within_minutes, key=key)
            raise NotImplementedError(
                "three-stage needs an optional() middle stage + within()")
        if len(self.stages) != 2:
            raise NotImplementedError("1-3 stage sequences supported")
        a, b = self.stages
        if b.one_or_more:
            raise NotImplementedError("oneOrMore only on the begin stage")
        if b.strict:
            return stateful.cep_next(events, a.event_type, b.event_type, key=key)
        if self.within_minutes is None:
            raise ValueError("within(minutes) is required (WITHIN clause)")
        if b.negated:
            return stateful.cep_not_followed_by(
                events, a.event_type, b.event_type, self.within_minutes, key=key)
        if b.any_match:
            return stateful.cep_followed_by_any(
                events, a.event_type, b.event_type, self.within_minutes, key=key)
        if a.times_n and a.or_more:
            return stateful.cep_times_or_more(
                events, a.event_type, b.event_type, a.times_n,
                self.within_minutes, key=key)
        if a.one_or_more:
            return stateful.cep_one_or_more(
                events, a.event_type, b.event_type, self.within_minutes, key=key)
        return stateful.cep_followed_by(
            events, a.event_type, b.event_type, self.within_minutes, key=key)


def match_recognize(events: DataFrame, partition_by: str,
                    define: dict[str, str], pattern: "Pattern",
                    order_by: str = "ts") -> DataFrame:
    """MATCH_RECOGNIZE-style entry point (``StreamExecMatch.scala:69`` /
    ``MatchCodeGenerator.scala``): pattern variables are DEFINEd by
    arbitrary row predicates, not just event types.

    Compilation: evaluate the DEFINE predicates in declaration order and
    assign each row its first matching variable as a symbol column (the
    reference's NFA does the same — a row can take only one edge per
    run); rows matching no variable keep a symbol that matches no stage,
    so they still break strict (``next``) contiguity, exactly like
    MATCH_RECOGNIZE's unmatched-row semantics.  The symbol column then
    drives the same stateful NFA operators as the event-type patterns —
    no separate engine.

    ``pattern`` stages must name DEFINE variables.  Returns the match
    stream of the compiled pattern.
    """
    from pyspark.sql import functions as F

    # first-matching-variable-wins CASE chain, declaration order
    expr = F.lit("__none__")
    for var, pred in reversed(list(define.items())):
        expr = F.when(F.expr(pred), F.lit(var)).otherwise(expr)
    symbolized = (events
                  .withColumn("__symbol", expr)  # DEFINEs see original cols
                  .withColumnRenamed("event_type", "__orig_event_type")
                  .withColumnRenamed("__symbol", "event_type"))
    return pattern.match_stream(symbolized, key=partition_by)
