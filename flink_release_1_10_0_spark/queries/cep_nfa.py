"""CEP queries compiled through the generic NFA engine
(``streaming/nfa.py``) — arbitrary-length sequences, where/or
conditions, quantifiers, until-loops, and notNext, beyond the dedicated
two/three-stage operators.

Reference semantics: ``flink-libraries/flink-cep/.../pattern/
Pattern.java:50-542`` executed per key as in ``nfa/NFA.java:85`` /
``CepOperator.java:82``.

Oracle construction: between SINGLETON stages the default contiguity is
*relaxed deterministic* (``followedBy``): a partial match consumes the
FIRST matching event after its current position and every matching
begin-event starts a fresh run (no-skip) — those oracles unroll the
pattern as a chain of "next event of type X strictly after position P"
lateral joins per key.  LOOP stages carry the reference's full edge set
(stop-early PROCEED prefixes + the loop's own IGNORE survival,
``NFACompiler.java:827`` — see ``cep_nfa_loop_prefix_matches`` for the
two-row-family oracle shape).  The within-window applies to the
completed match — an event past the window kills a run before it can
consume, and any later completion would be past the window too, so
``end.ts - start.ts <= W`` is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.streaming.cep import Pattern
from flink_release_1_10_0_spark.streaming.core import read_stream_table, run_to_completion

# --------------------------------------------------------------------------
# Four-stage relaxed sequence (lifts the old 3-stage dispatch limit):
# signup -> click -> error -> purchase within 14 days
# --------------------------------------------------------------------------
_FOUR_STAGE_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT s.user_id, s.event_id AS start_id, d.event_id AS end_id,
       CAST(4 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'signup') s,
LATERAL (SELECT event_id, ts FROM ev b
         WHERE b.user_id = s.user_id AND b.event_type = 'click'
           AND (b.ts, b.event_id) > (s.ts, s.event_id)
         ORDER BY b.ts, b.event_id LIMIT 1) b,
LATERAL (SELECT event_id, ts FROM ev c
         WHERE c.user_id = s.user_id AND c.event_type = 'error'
           AND (c.ts, c.event_id) > (b.ts, b.event_id)
         ORDER BY c.ts, c.event_id LIMIT 1) c,
LATERAL (SELECT event_id, ts FROM ev d
         WHERE d.user_id = s.user_id AND d.event_type = 'purchase'
           AND (d.ts, d.event_id) > (c.ts, c.event_id)
         ORDER BY d.ts, d.event_id LIMIT 1) d
WHERE d.ts <= s.ts + INTERVAL 14 DAY
"""


@register("cep_nfa_four_stage", _FOUR_STAGE_ORACLE)
def cep_nfa_four_stage(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click").followed_by("error")
         .followed_by("purchase").within(14 * 24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Or-condition on the begin stage (Pattern.where(...).or(...)):
# (click OR view) -> purchase within 3 days
# --------------------------------------------------------------------------
_OR_COND_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT a.user_id, a.event_id AS start_id, p.event_id AS end_id
FROM (SELECT * FROM ev WHERE event_type IN ('click', 'view')) a,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = a.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) > (a.ts, a.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p
WHERE p.ts <= a.ts + INTERVAL 3 DAY
"""


@register("cep_nfa_or_condition", _OR_COND_ORACLE)
def cep_nfa_or_condition(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("click").or_("event_type = 'view'")
         .followed_by("purchase").within(3 * 24 * 60).match_stream(ev))
    return run_to_completion(m.select("user_id", "start_id", "end_id"),
                             "append")


# --------------------------------------------------------------------------
# Where-condition (IterativeCondition on row fields):
# purchase[value > 80] -> error within 5 days
# --------------------------------------------------------------------------
_WHERE_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type, value FROM events)
SELECT a.user_id, a.event_id AS start_id, e.event_id AS end_id
FROM (SELECT * FROM ev WHERE event_type = 'purchase' AND value > 80) a,
LATERAL (SELECT event_id, ts FROM ev e
         WHERE e.user_id = a.user_id AND e.event_type = 'error'
           AND (e.ts, e.event_id) > (a.ts, a.event_id)
         ORDER BY e.ts, e.event_id LIMIT 1) e
WHERE e.ts <= a.ts + INTERVAL 5 DAY
"""


@register("cep_nfa_where_value", _WHERE_ORACLE)
def cep_nfa_where_value(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("purchase").where("value > 80")
         .followed_by("error").within(5 * 24 * 60).match_stream(ev))
    return run_to_completion(m.select("user_id", "start_id", "end_id"),
                             "append")


# --------------------------------------------------------------------------
# Bounded quantifier on the begin stage: click.times(2) -> purchase
# within 7 days.  Relaxed loop contiguity: the second click is the next
# click after the first (non-clicks in between are ignored), the
# purchase is the next purchase after the second click.
# --------------------------------------------------------------------------
_TIMES_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT c1.user_id, c1.event_id AS start_id, p.event_id AS end_id,
       CAST(3 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'click') c1,
LATERAL (SELECT event_id, ts FROM ev c2
         WHERE c2.user_id = c1.user_id AND c2.event_type = 'click'
           AND (c2.ts, c2.event_id) > (c1.ts, c1.event_id)
         ORDER BY c2.ts, c2.event_id LIMIT 1) c2,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = c1.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) > (c2.ts, c2.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p
WHERE p.ts <= c1.ts + INTERVAL 7 DAY
"""


@register("cep_nfa_times_two", _TIMES_ORACLE)
def cep_nfa_times_two(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("click").times(2)
         .followed_by("purchase").within(7 * 24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Trailing unbounded loop with until(): signup -> click.oneOrMore()
# .until(purchase), within 7 days.  Reference semantics
# (Pattern.java:306 oneOrMore, non-greedy): the loop emits one PARTIAL
# match per extension — signup + the first k clicks, for every k — and
# the until-event (first purchase after the signup) merely STOPS the
# loop, killing the run without a further emission (all its prefixes
# are already out).  Clicks after the closing purchase, or beyond the
# 7-day window, extend nothing.  (Round 7 upgraded this query from the
# old maximal-match-on-close narrowing to the reference behavior.)
# --------------------------------------------------------------------------
_UNTIL_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events),
s AS (SELECT user_id, event_id AS start_id, ts AS s_ts
      FROM ev WHERE event_type = 'signup'),
fp AS (
  SELECT s.user_id, s.start_id, s.s_ts, p.ts AS p_ts, p.event_id AS p_id
  FROM s LEFT JOIN LATERAL (
    SELECT event_id, ts FROM ev p
    WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
      AND (p.ts, p.event_id) > (s.s_ts, s.start_id)
    ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE)
SELECT fp.user_id, fp.start_id, c.event_id AS end_id,
       CAST(row_number() OVER (PARTITION BY fp.user_id, fp.start_id
                               ORDER BY c.ts, c.event_id) + 1
            AS INT) AS n_events
FROM fp
JOIN ev c
  ON c.user_id = fp.user_id AND c.event_type = 'click'
 AND (c.ts, c.event_id) > (fp.s_ts, fp.start_id)
 AND (fp.p_ts IS NULL OR (c.ts, c.event_id) < (fp.p_ts, fp.p_id))
WHERE c.ts <= fp.s_ts + INTERVAL 7 DAY
"""


@register("cep_nfa_until_loop", _UNTIL_ORACLE)
def cep_nfa_until_loop(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click").one_or_more()
         .until("event_type = 'purchase'").within(7 * 24 * 60)
         .match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Strict absence guard (Pattern.notNext): error, whose IMMEDIATELY
# following event is not a click, then the next purchase at-or-after
# that guard event, within 3 days.
# --------------------------------------------------------------------------
_NOT_NEXT_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT e.user_id, e.event_id AS start_id, p.event_id AS end_id
FROM (SELECT * FROM ev WHERE event_type = 'error') e,
LATERAL (SELECT event_id, ts, event_type FROM ev nx
         WHERE nx.user_id = e.user_id
           AND (nx.ts, nx.event_id) > (e.ts, e.event_id)
         ORDER BY nx.ts, nx.event_id LIMIT 1) nx,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) >= (nx.ts, nx.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p
WHERE nx.event_type <> 'click'
  AND p.ts <= e.ts + INTERVAL 3 DAY
"""


@register("cep_nfa_not_next", _NOT_NEXT_ORACLE)
def cep_nfa_not_next(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("error").not_next("click")
         .followed_by("purchase").within(3 * 24 * 60).match_stream(ev))
    return run_to_completion(m.select("user_id", "start_id", "end_id"),
                             "append")


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE with a real PATTERN string: A B+ C over consecutive
# rows per user (StreamExecMatch.scala:69 grammar; strict row
# contiguity).  Greedy B+ consumes every consecutive view, so the match
# is the click, the full view run, and the immediately following
# purchase with value > 10.
# --------------------------------------------------------------------------
_MR_PATTERN_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.user_id, a.event_id AS start_id, nx.event_id AS end_id,
       CAST(nx.rn - a.rn + 1 AS INT) AS n_events
FROM (SELECT * FROM o WHERE event_type = 'click') a,
LATERAL (SELECT rn, event_id, event_type, value FROM o x
         WHERE x.user_id = a.user_id AND x.rn > a.rn
           AND x.event_type <> 'view'
         ORDER BY x.rn LIMIT 1) nx
WHERE nx.event_type = 'purchase' AND nx.value > 10
  AND nx.rn > a.rn + 1
"""


@register("cep_match_recognize_pattern", _MR_PATTERN_ORACLE)
def cep_match_recognize_pattern(spark, sf_dir):
    from flink_release_1_10_0_spark.streaming.cep import match_recognize_pattern
    ev = read_stream_table(spark, sf_dir, "events")
    m = match_recognize_pattern(
        ev, "user_id",
        define={"A": "event_type = 'click'",
                "B": "event_type = 'view'",
                "C": "event_type = 'purchase' AND value > 10"},
        pattern="A B+ C")
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE MEASURES — ONE ROW PER MATCH
# (StreamExecMatch.scala:69 / MatchCodeGenerator.scala measure codegen)
# --------------------------------------------------------------------------
_MR_MEASURES_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, nx.rn AS c_rn,
         a.value AS a_val, nx.value AS c_val
  FROM (SELECT * FROM o WHERE event_type = 'click') a,
  LATERAL (SELECT rn, event_type, value FROM o x
           WHERE x.user_id = a.user_id AND x.rn > a.rn
             AND x.event_type <> 'view'
           ORDER BY x.rn LIMIT 1) nx
  WHERE nx.event_type = 'purchase' AND nx.value > 10 AND nx.rn > a.rn + 1)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY a_rn) AS BIGINT)
         AS match_no,
       a_val,
       CAST((SELECT count(*) FROM o b
             WHERE b.user_id = m.user_id AND b.rn > m.a_rn AND b.rn < m.c_rn)
            AS BIGINT) AS n_b,
       CAST((SELECT SUM(CAST(b.value AS DECIMAL(18,2))) FROM o b
             WHERE b.user_id = m.user_id AND b.rn > m.a_rn AND b.rn < m.c_rn)
            AS DOUBLE) AS b_sum,
       c_val
FROM m
"""


@register("cep_mr_measures_one_row", _MR_MEASURES_ORACLE)
def cep_mr_measures_one_row(spark, sf_dir):
    """MEASURES over A B+ C: FIRST/LAST/COUNT/SUM per pattern variable,
    ONE ROW PER MATCH with MATCH_NUMBER()."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.streaming.cep import (
        match_recognize_measures, match_recognize_pattern)

    ev = read_stream_table(spark, sf_dir, "events")
    m = match_recognize_pattern(
        ev, "user_id",
        define={"A": "event_type = 'click'",
                "B": "event_type = 'view'",
                "C": "event_type = 'purchase' AND value > 10"},
        pattern="A B+ C")
    log = run_to_completion(m, "append")
    out = match_recognize_measures(
        log, t(spark, sf_dir, "events").select("event_id", "value"),
        stage_names=["A", "B", "C"],
        measures={"a_val": "FIRST(A.value)", "n_b": "COUNT(B.*)",
                  "b_sum": "SUM(B.value)", "c_val": "LAST(C.value)"},
        partition_by="user_id", rows_per_match="one")
    return out.withColumn("match_no", F.col("match_no").cast("bigint"))


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE — ALL ROWS PER MATCH (+ CLASSIFIER(), MATCH_NUMBER())
# --------------------------------------------------------------------------
_MR_ALL_ROWS_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, nx.rn AS c_rn
  FROM (SELECT * FROM o WHERE event_type = 'click') a,
  LATERAL (SELECT rn, event_type, value FROM o x
           WHERE x.user_id = a.user_id AND x.rn > a.rn
             AND x.event_type <> 'view'
           ORDER BY x.rn LIMIT 1) nx
  WHERE nx.event_type = 'purchase' AND nx.value > 10 AND nx.rn > a.rn + 1),
mm AS (
  SELECT user_id, a_rn, c_rn,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY a_rn) AS BIGINT)
           AS match_no
  FROM m)
SELECT mm.user_id, mm.match_no,
       CAST(e.rn - mm.a_rn AS BIGINT) AS pos,
       e.event_id,
       CASE WHEN e.rn = mm.a_rn THEN 'A'
            WHEN e.rn = mm.c_rn THEN 'C' ELSE 'B' END AS classifier,
       CAST(mm.c_rn - mm.a_rn - 1 AS BIGINT) AS n_b
FROM mm JOIN o e
  ON e.user_id = mm.user_id AND e.rn BETWEEN mm.a_rn AND mm.c_rn
"""


@register("cep_mr_all_rows_per_match", _MR_ALL_ROWS_ORACLE)
def cep_mr_all_rows_per_match(spark, sf_dir):
    """ALL ROWS PER MATCH: one output row per consumed event with
    CLASSIFIER() and final-value measures."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.streaming.cep import (
        match_recognize_measures, match_recognize_pattern)

    ev = read_stream_table(spark, sf_dir, "events")
    m = match_recognize_pattern(
        ev, "user_id",
        define={"A": "event_type = 'click'",
                "B": "event_type = 'view'",
                "C": "event_type = 'purchase' AND value > 10"},
        pattern="A B+ C")
    log = run_to_completion(m, "append")
    out = match_recognize_measures(
        log, t(spark, sf_dir, "events").select("event_id", "value"),
        stage_names=["A", "B", "C"],
        measures={"n_b": "COUNT(B.*)"},
        partition_by="user_id", rows_per_match="all")
    return (out.withColumn("match_no", F.col("match_no").cast("bigint"))
            .withColumn("pos", F.col("pos").cast("bigint")))


# --------------------------------------------------------------------------
# AFTER MATCH SKIP TO LAST <var>
# (AfterMatchSkipStrategy.skipToLast, nfa/aftermatch/)
# --------------------------------------------------------------------------
# Pattern A+ C (A=click, C=purchase, strict contiguity): every click of a
# maximal consecutive-click run spawns a parallel run; the purchase closes
# the oldest (maximal) match first, and SKIP TO LAST A then discards every
# partial run begun before the run's last click — so exactly the maximal
# match and the 2-event (last-click, purchase) match survive.
_MR_SKIP_TO_LAST_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
c AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      FROM o WHERE event_type = 'click'),
runs AS (SELECT user_id, grp, min(rn) AS first_rn, max(rn) AS last_rn,
                count(*) AS n_a
         FROM c GROUP BY user_id, grp),
matched AS (SELECT r.*, p.event_id AS end_id
            FROM runs r JOIN o p
              ON p.user_id = r.user_id AND p.rn = r.last_rn + 1
            WHERE p.event_type = 'purchase')
SELECT m.user_id, f.event_id AS start_id, m.end_id,
       CAST(m.n_a + 1 AS INT) AS n_events
FROM matched m JOIN o f ON f.user_id = m.user_id AND f.rn = m.first_rn
UNION ALL
SELECT m.user_id, l.event_id AS start_id, m.end_id,
       CAST(2 AS INT) AS n_events
FROM matched m JOIN o l ON l.user_id = m.user_id AND l.rn = m.last_rn
WHERE m.n_a >= 2
"""


@register("cep_mr_skip_to_last", _MR_SKIP_TO_LAST_ORACLE)
def cep_mr_skip_to_last(spark, sf_dir):
    from flink_release_1_10_0_spark.streaming.cep import match_recognize_pattern

    ev = read_stream_table(spark, sf_dir, "events")
    m = match_recognize_pattern(
        ev, "user_id",
        define={"A": "event_type = 'click'",
                "C": "event_type = 'purchase'"},
        pattern="A+ C",
        after_match="skip_to_last A")
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE — RUNNING measures in ALL ROWS PER MATCH
# (MatchCodeGenerator.scala RUNNING/FINAL codegen split)
# --------------------------------------------------------------------------
_MR_RUNNING_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, nx.rn AS c_rn
  FROM (SELECT * FROM o WHERE event_type = 'click') a,
  LATERAL (SELECT rn, event_type, value FROM o x
           WHERE x.user_id = a.user_id AND x.rn > a.rn
             AND x.event_type <> 'view'
           ORDER BY x.rn LIMIT 1) nx
  WHERE nx.event_type = 'purchase' AND nx.value > 10 AND nx.rn > a.rn + 1),
mm AS (
  SELECT user_id, a_rn, c_rn,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY c_rn, a_rn)
              AS BIGINT) AS match_no
  FROM m),
rows_ AS (
  SELECT mm.user_id, mm.match_no,
         CAST(e.rn - mm.a_rn AS BIGINT) AS pos,
         e.event_id, e.value,
         CASE WHEN e.rn = mm.a_rn THEN 'A'
              WHEN e.rn = mm.c_rn THEN 'C' ELSE 'B' END AS classifier,
         CAST(mm.c_rn - mm.a_rn - 1 AS BIGINT) AS n_b_final
  FROM mm JOIN o e
    ON e.user_id = mm.user_id AND e.rn BETWEEN mm.a_rn AND mm.c_rn)
SELECT user_id, match_no, pos, event_id, classifier, n_b_final,
       count(CASE WHEN classifier = 'B' THEN 1 END)
         OVER (PARTITION BY user_id, match_no ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_b_running,
       CAST(SUM(CASE WHEN classifier = 'B'
                     THEN CAST(value AS DECIMAL(18,2)) END)
              OVER (PARTITION BY user_id, match_no ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS b_sum_running
FROM rows_
"""


@register("cep_mr_running_measures", _MR_RUNNING_ORACLE)
def cep_mr_running_measures(spark, sf_dir):
    """RUNNING vs FINAL measures in ALL ROWS PER MATCH: the running
    count/sum aggregate the match PREFIX up to each row (SQL:2016
    RUNNING), next to the whole-match FINAL value on the same row."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.streaming.cep import (
        match_recognize_measures, match_recognize_pattern)

    ev = read_stream_table(spark, sf_dir, "events")
    m = match_recognize_pattern(
        ev, "user_id",
        define={"A": "event_type = 'click'",
                "B": "event_type = 'view'",
                "C": "event_type = 'purchase' AND value > 10"},
        pattern="A B+ C")
    log = run_to_completion(m, "append")
    out = match_recognize_measures(
        log, t(spark, sf_dir, "events").select("event_id", "value"),
        stage_names=["A", "B", "C"],
        measures={"n_b_final": "COUNT(B.*)",
                  "n_b_running": "RUNNING COUNT(B.*)",
                  "b_sum_running": "RUNNING SUM(B.value)"},
        partition_by="user_id", rows_per_match="all")
    return (out.withColumn("match_no", F.col("match_no").cast("bigint"))
            .withColumn("pos", F.col("pos").cast("bigint"))
            .select("user_id", "match_no", "pos", "event_id", "classifier",
                    "n_b_final", "n_b_running", "b_sum_running"))


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE as raw SQL text (sql_match.py front end): the full
# Flink 1.10 clause — PARTITION BY / ORDER BY / MEASURES incl.
# MATCH_NUMBER() / ONE ROW PER MATCH / AFTER MATCH / PATTERN / DEFINE —
# parsed from the statement and executed on the same NFA + measures
# stack the structured API uses, so the oracle is the verified
# cep_mr_measures_one_row replay.
# --------------------------------------------------------------------------
_SQL_MR_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no, a_val, n_b, b_sum, c_val
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.value) AS a_val, COUNT(B.*) AS n_b,
           SUM(B.value) AS b_sum, LAST(C.value) AS c_val,
           MATCH_NUMBER() AS match_no
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B+ C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view',
         C AS event_type = 'purchase' AND C.value > 10
) AS m
"""


@register("flink_sql_match_recognize", _MR_MEASURES_ORACLE)
def flink_sql_match_recognize(spark, sf_dir):
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# SQL-text variant of ALL ROWS PER MATCH: CLASSIFIER()/MATCH_NUMBER()
# surfaced through the raw clause, same verified oracle replay.
_SQL_MR_ALL_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       CAST(pos AS BIGINT) AS pos, event_id, classifier, n_b
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES COUNT(B.*) AS n_b, MATCH_NUMBER() AS match_no
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B+ C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view',
         C AS event_type = 'purchase' AND C.value > 10
) AS m
"""


@register("flink_sql_match_recognize_all_rows", _MR_ALL_ROWS_ORACLE)
def flink_sql_match_recognize_all_rows(spark, sf_dir):
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_ALL_TEXT,
        batch_df=t(spark, sf_dir, "events").select("event_id", "value"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# DEFINE navigation (round-6 residual closer): cross-variable LAST/FIRST
# inside DEFINE, the reference's IterativeCondition path
# (flink-table-planner-blink/.../codegen/MatchCodeGenerator.scala
# navigation codegen; flink-cep/.../nfa/NFA.java:85 match buffer).
# Strict SQL row-pattern contiguity makes the oracle exact: a match is
# four CONSECUTIVE rows (rn .. rn+3) per user satisfying the navigated
# comparisons, and match_no is completion order (end rn, then start rn)
# — the same numbering match_recognize_measures emits.
# --------------------------------------------------------------------------
_MR_NAV_LAST_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, c.rn AS c_rn,
         a.value AS a_val, b1.value AS b_first, b2.value AS b_last,
         c.value AS c_val
  FROM o a
  JOIN o b1 ON b1.user_id = a.user_id AND b1.rn = a.rn + 1
  JOIN o b2 ON b2.user_id = a.user_id AND b2.rn = a.rn + 2
  JOIN o c  ON c.user_id  = a.user_id AND c.rn  = a.rn + 3
  WHERE a.event_type = 'click'
    AND b1.event_type = 'view' AND b1.value > a.value
    AND b2.event_type = 'view' AND b2.value > a.value
    AND c.event_type = 'purchase' AND c.value < b1.value)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY c_rn, a_rn)
            AS BIGINT) AS match_no,
       a_val, b_first, b_last, c_val
FROM m
"""

_SQL_MR_NAV_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       a_val, b_first, b_last, c_val
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.value) AS a_val, FIRST(B.value) AS b_first,
           LAST(B.value) AS b_last, LAST(C.value) AS c_val,
           MATCH_NUMBER() AS match_no
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B{2} C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view' AND B.value > LAST(A.value),
         C AS event_type = 'purchase' AND C.value < FIRST(B.value)
) AS m
"""


@register("flink_sql_mr_define_last_nav", _MR_NAV_LAST_ORACLE)
def flink_sql_mr_define_last_nav(spark, sf_dir):
    """DEFINE with cross-variable navigation: B must exceed the matched
    A's value (LAST(A.value)), C must drop below the first B
    (FIRST(B.value)) — evaluated per run against the NFA's bounded
    match buffer, never precomputable as a static column."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_NAV_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# PREV physical navigation: ascending value run over consecutive
# partition rows (SQL:2016 PREV navigates physical rows — under strict
# row-pattern contiguity that is the previously consumed row for U>=2
# and the S row for the first U).
# --------------------------------------------------------------------------
_MR_NAV_PREV_ORACLE = """
WITH o AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         lead(value, 1) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS v1,
         lead(value, 2) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS v2,
         lead(value, 3) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS v3
  FROM events),
m AS (
  -- lead()-based consecutive-row access: the 4-way rn-chain self-join
  -- formulation is semantically identical but DuckDB's join ordering
  -- degrades it to a per-key cross product at larger scales
  SELECT user_id, rn, value AS s_val, v1 AS u_first, v3 AS u_last
  FROM o
  WHERE v1 > value AND v2 > v1 AND v3 > v2)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS BIGINT) AS match_no,
       s_val, u_first, u_last
FROM m
"""

_SQL_MR_PREV_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       s_val, u_first, u_last
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(S.value) AS s_val, FIRST(U.value) AS u_first,
           LAST(U.value) AS u_last, MATCH_NUMBER() AS match_no
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (S U{3})
  DEFINE S AS TRUE,
         U AS U.value > PREV(U.value)
) AS m
"""


@register("flink_sql_mr_prev_ascending", _MR_NAV_PREV_ORACLE)
def flink_sql_mr_prev_ascending(spark, sf_dir):
    """PREV physical navigation in DEFINE: a 4-row strictly ascending
    value run per user — the per-run closure reads the previous
    partition row tracked in the stateful operator."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_PREV_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE + group window in ONE statement (round-6 routing fix):
# the clause is excised onto the NFA stack and the OUTER remainder —
# a Flink TUMBLE group window over the match output — goes through
# rewrite_group_windows before Catalyst runs it.  Reference: the
# planner composes StreamExecMatch with StreamExecGroupWindowAggregate
# in one pipeline (flink-table-planner-blink physical/stream/).
# --------------------------------------------------------------------------
_MR_TUMBLE_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, b.ts AS m_end, b.value AS b_val
  FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1
  WHERE a.event_type = 'click' AND b.event_type = 'purchase')
SELECT user_id, CAST(date_trunc('day', m_end) AS TIMESTAMP) AS d,
       COUNT(*) AS n_matches,
       CAST(SUM(CAST(b_val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
FROM m GROUP BY 1, 2
"""

_SQL_MR_TUMBLE_TEXT = """
SELECT user_id, TUMBLE_START(m_end, INTERVAL '1' DAY) AS d,
       COUNT(*) AS n_matches,
       CAST(SUM(CAST(b_val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES LAST(B.ts) AS m_end, LAST(B.value) AS b_val
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'purchase'
) AS m
GROUP BY user_id, TUMBLE(m_end, INTERVAL '1' DAY)
"""


@register("flink_sql_mr_tumble_outer", _MR_TUMBLE_ORACLE)
def flink_sql_mr_tumble_outer(spark, sf_dir):
    """Row-pattern matches rolled into a tumbling day window in the
    same SQL statement — the outer group window is rewritten
    (sql_windows.py) around the excised clause."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_TUMBLE_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# ALL ROWS PER MATCH over a navigated DEFINE: every consumed row of the
# nav-matched window is emitted with CLASSIFIER()/MATCH_NUMBER() plus a
# FINAL measure — navigation decides membership, the measures
# projection then works off the match log exactly as for static
# predicates (MatchCodeGenerator.scala ALL ROWS output mode).
# --------------------------------------------------------------------------
_MR_NAV_ALL_ROWS_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, c.rn AS c_rn, b1.value AS b_first
  FROM o a
  JOIN o b1 ON b1.user_id = a.user_id AND b1.rn = a.rn + 1
  JOIN o b2 ON b2.user_id = a.user_id AND b2.rn = a.rn + 2
  JOIN o c  ON c.user_id  = a.user_id AND c.rn  = a.rn + 3
  WHERE a.event_type = 'click'
    AND b1.event_type = 'view' AND b1.value > a.value
    AND b2.event_type = 'view' AND b2.value > a.value
    AND c.event_type = 'purchase' AND c.value < b1.value),
mm AS (
  SELECT user_id, a_rn, c_rn, b_first,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY c_rn, a_rn)
              AS BIGINT) AS match_no
  FROM m)
SELECT mm.user_id, mm.match_no, CAST(e.rn - mm.a_rn AS BIGINT) AS pos,
       e.event_id,
       CASE WHEN e.rn = mm.a_rn THEN 'A'
            WHEN e.rn = mm.c_rn THEN 'C' ELSE 'B' END AS classifier,
       mm.b_first
FROM mm JOIN o e
  ON e.user_id = mm.user_id AND e.rn BETWEEN mm.a_rn AND mm.c_rn
"""

_SQL_MR_NAV_ALL_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       CAST(pos AS BIGINT) AS pos, event_id, classifier, b_first
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(B.value) AS b_first, MATCH_NUMBER() AS match_no
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B{2} C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view' AND B.value > LAST(A.value),
         C AS event_type = 'purchase' AND C.value < FIRST(B.value)
) AS m
"""


@register("flink_sql_mr_nav_all_rows", _MR_NAV_ALL_ROWS_ORACLE)
def flink_sql_mr_nav_all_rows(spark, sf_dir):
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_NAV_ALL_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# The reference docs' canonical MATCH_RECOGNIZE query — the V-shape
# price pattern (Flink 1.10 docs, "Detecting patterns in Tables";
# MatchCodeGenerator.scala's own test corpus): a strictly descending
# run (each DOWN below the previous DOWN, the first below START)
# followed by one UP above the last DOWN.  Needs own-variable
# LAST(DOWN.value, 1) with IS NULL seed AND a bare cross-variable
# STRT.value reference — exactly the navigation tier.
#
# Oracle shape: under strict row-pattern contiguity a DOWN-run is a
# maximal block of consecutive rows with value < previous value; every
# start position rn whose next row lies in the block emits one match
# (greedy B+ consumes to the block end e; no-skip starts a run at every
# row), completed iff value[e+1] > value[e].
# --------------------------------------------------------------------------
_MR_VSHAPE_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
d AS (
  SELECT user_id, event_id, value, rn,
         CASE WHEN value < lag(value) OVER (PARTITION BY user_id ORDER BY rn)
              THEN 1 ELSE 0 END AS dn
  FROM o),
g AS (  -- down-run group id: increments on every non-descending row
  SELECT *, SUM(1 - dn) OVER (PARTITION BY user_id ORDER BY rn) AS grp
  FROM d),
runs AS (  -- maximal descending blocks [s..e], dn=1 throughout
  SELECT user_id, grp, MIN(rn) AS s, MAX(rn) AS e
  FROM g WHERE dn = 1 GROUP BY user_id, grp),
ok AS (   -- completed V: the row after the block ticks up
  SELECT r.user_id, r.s, r.e, eu.value AS up_val, eb.value AS bottom_val
  FROM runs r
  JOIN o eu ON eu.user_id = r.user_id AND eu.rn = r.e + 1
  JOIN o eb ON eb.user_id = r.user_id AND eb.rn = r.e
  WHERE eu.value > eb.value),
m AS (    -- one match per start position rn in [s-1 .. e-1]
  SELECT k.user_id, st.value AS strt_val, k.bottom_val, k.up_val,
         CAST(k.e - st.rn AS BIGINT) AS n_down,
         st.rn AS a_rn, k.e + 1 AS c_rn
  FROM ok k
  JOIN o st ON st.user_id = k.user_id AND st.rn BETWEEN k.s - 1 AND k.e - 1)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY c_rn, a_rn)
            AS BIGINT) AS match_no,
       strt_val, bottom_val, up_val, n_down
FROM m
"""

_SQL_MR_VSHAPE_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       strt_val, bottom_val, up_val, n_down
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(STRT.value) AS strt_val,
           LAST(DOWN.value) AS bottom_val,
           LAST(UP.value) AS up_val,
           COUNT(DOWN.*) AS n_down,
           MATCH_NUMBER() AS match_no
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT DOWN+ UP)
  DEFINE STRT AS TRUE,
         DOWN AS (LAST(DOWN.value, 1) IS NULL AND DOWN.value < STRT.value)
                 OR DOWN.value < LAST(DOWN.value, 1),
         UP AS UP.value > LAST(DOWN.value)
) AS m
"""


@register("flink_sql_mr_vshape_canonical", _MR_VSHAPE_ORACLE)
def flink_sql_mr_vshape_canonical(spark, sf_dir):
    """The Flink docs' canonical V-pattern, verbatim clause grammar:
    own-variable LAST(DOWN.value, 1) (previous DOWN, NULL-seeded) and a
    bare STRT.value cross-variable reference inside DEFINE."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_VSHAPE_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Composite PARTITION BY + ORDER BY tiebreaker (round-7 residual
# closer): the reference supports arbitrary partition collations and
# order-by tiebreakers (physical/stream/StreamExecMatch.scala:69);
# real MR users partition by (tenant, symbol) pairs routinely.  Here
# the NFA shuffles on (user_id, event_type) — a string key column in
# the composite — and processes each partition in (ts, event_id)
# order.  Strict SQL row-pattern contiguity makes the oracle exact:
# a match is two CONSECUTIVE partition rows crossing the 50 threshold.
# --------------------------------------------------------------------------
_MR_COMPOSITE_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, event_id, value,
         lead(value)    OVER w AS nv,
         lead(event_id) OVER w AS nid
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type,
       CAST(event_id AS BIGINT) AS start_id,
       CAST(nid      AS BIGINT) AS end_id,
       value AS low_val, nv AS high_val
FROM o
WHERE value < 50 AND nv >= 50
"""

_SQL_MR_COMPOSITE_TEXT = """
SELECT user_id, event_type, CAST(start_id AS BIGINT) AS start_id,
       CAST(end_id AS BIGINT) AS end_id, low_val, high_val
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id, event_type
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id,
           FIRST(A.value) AS low_val, LAST(B.value) AS high_val
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS A.value < 50,
         B AS B.value >= 50
) AS m
"""


@register("flink_sql_mr_composite_partition", _MR_COMPOSITE_ORACLE)
def flink_sql_mr_composite_partition(spark, sf_dir):
    """MATCH_RECOGNIZE partitioned by TWO columns (bigint + string)
    with an ORDER BY tiebreaker — the keyed shuffle, state layout, and
    MEASURES projection all run on the composite key."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_COMPOSITE_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Trailing non-greedy oneOrMore WITHOUT until (round-7 residual closer):
# error -> view.oneOrMore() within 1 day.  Reference semantics
# (Pattern.java:306): one partial match per loop extension — the error
# plus the first k views after it, for every k whose k-th view is
# inside the window.  Nothing "closes" the loop; emission happens as
# the match grows, which is what makes the shape usable on an
# unbounded stream at all.
# --------------------------------------------------------------------------
_TRAILING_OOM_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT s.user_id, s.event_id AS start_id, c.event_id AS end_id,
       CAST(row_number() OVER (PARTITION BY s.user_id, s.event_id
                               ORDER BY c.ts, c.event_id) + 1
            AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'error') s
JOIN ev c
  ON c.user_id = s.user_id AND c.event_type = 'view'
 AND (c.ts, c.event_id) > (s.ts, s.event_id)
WHERE c.ts <= s.ts + INTERVAL 1 DAY
"""


@register("cep_nfa_trailing_one_or_more", _TRAILING_OOM_ORACLE)
def cep_nfa_trailing_one_or_more(spark, sf_dir):
    """Per-extension emission for a trailing relaxed oneOrMore — the
    round-6 scope note removed: no until() required."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("error").followed_by("view").one_or_more()
         .within(24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Trailing optional (round-7 residual closer): purchase[value > 120] ->
# error.optional() within 2 days.  Reference semantics
# (Pattern.java:246): BOTH matches emit — the short one (just the
# purchase) the moment the purchase arrives, and the long one when the
# first error after it (relaxed contiguity) lands inside the window.
# --------------------------------------------------------------------------
_TRAILING_OPT_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type, value FROM events),
a AS (SELECT * FROM ev WHERE event_type = 'purchase' AND value > 120)
SELECT user_id, event_id AS start_id, event_id AS end_id,
       CAST(1 AS INT) AS n_events
FROM a
UNION ALL
SELECT a.user_id, a.event_id AS start_id, e.event_id AS end_id,
       CAST(2 AS INT) AS n_events
FROM a,
LATERAL (SELECT event_id, ts FROM ev e
         WHERE e.user_id = a.user_id AND e.event_type = 'error'
           AND (e.ts, e.event_id) > (a.ts, a.event_id)
         ORDER BY e.ts, e.event_id LIMIT 1) e
WHERE e.ts <= a.ts + INTERVAL 2 DAY
"""


@register("cep_nfa_trailing_optional", _TRAILING_OPT_ORACLE)
def cep_nfa_trailing_optional(spark, sf_dir):
    """Trailing optional stage — the round-6 rejection removed: the NFA
    emits the short match on the mandatory prefix and the long match on
    the optional extension."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("purchase").where("value > 120")
         .followed_by("error").optional().within(2 * 24 * 60)
         .match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Compound MEASURES expressions (round-7 surface extension): the
# reference accepts arbitrary scalar expressions over navigation
# aggregates in MEASURES (MatchCodeGenerator.scala measure codegen);
# here LAST(B.value) - FIRST(A.value) and a COUNT sum compile to one
# SQL aggregate expression over the exploded match rows.
# --------------------------------------------------------------------------
_MR_MEASURE_EXPR_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, value,
         lead(value)    OVER w AS nv,
         lead(event_id) OVER w AS nid
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       CAST(event_id AS BIGINT) AS start_id,
       ROUND(nv - value, 6) AS rise,
       CAST(2 AS INT) AS n_ev
FROM o
WHERE value < 50 AND nv >= 50
"""

_SQL_MR_MEASURE_EXPR_TEXT = """
SELECT user_id, CAST(start_id AS BIGINT) AS start_id, rise,
       CAST(n_ev AS INT) AS n_ev
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id,
           ROUND(LAST(B.value) - FIRST(A.value), 6) AS rise,
           COUNT(A.*) + COUNT(B.*) AS n_ev
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS A.value < 50,
         B AS B.value >= 50
) AS m
"""


@register("flink_sql_mr_measures_expression", _MR_MEASURE_EXPR_ORACLE)
def flink_sql_mr_measures_expression(spark, sf_dir):
    """MEASURES with compound scalar expressions over navigation
    aggregates — subtraction across variables inside ROUND, and a sum
    of two COUNTs — compiled by cep.py _measure_sql_any."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_MEASURE_EXPR_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# MEASURES navigation offsets (round-7 surface extension): SQL:2016
# FIRST/LAST second argument — LAST(B.value, 1) is the second-to-last
# row mapped to B; an offset past the mapped rows yields NULL
# (MatchCodeGenerator.scala navigation codegen accepts the same).
# PATTERN (A B{2}): a sub-50 value followed by exactly two >=50 values
# on consecutive rows, so LAST(B.value, 1) is deterministically the
# first B and the out-of-range LAST(B.value, 5) is NULL.
# --------------------------------------------------------------------------
_MR_NAV_OFFSET_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, value,
         lead(value)    OVER w AS v1,
         lead(value, 2) OVER w AS v2,
         lead(event_id, 2) OVER w AS id2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       CAST(event_id AS BIGINT) AS start_id,
       ROUND(v1, 6) AS b_prev,
       ROUND(v2, 6) AS b_last,
       CAST(id2 AS BIGINT) AS b_last_id,
       CAST(NULL AS DOUBLE) AS b_oob
FROM o
WHERE value < 50 AND v1 >= 50 AND v2 >= 50
"""

_SQL_MR_NAV_OFFSET_TEXT = """
SELECT user_id, CAST(start_id AS BIGINT) AS start_id,
       ROUND(b_prev, 6) AS b_prev, ROUND(b_last, 6) AS b_last,
       CAST(b_last_id AS BIGINT) AS b_last_id,
       CAST(b_oob AS DOUBLE) AS b_oob
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id,
           LAST(B.value, 1) AS b_prev,
           LAST(B.value) AS b_last,
           LAST(B.event_id) AS b_last_id,
           LAST(B.value, 5) AS b_oob
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B{2})
  DEFINE A AS A.value < 50,
         B AS B.value >= 50
) AS m
"""


@register("flink_sql_mr_nav_offset_measures", _MR_NAV_OFFSET_ORACLE)
def flink_sql_mr_nav_offset_measures(spark, sf_dir):
    """MEASURES logical navigation offsets: LAST(B.value, 1) /
    out-of-range LAST(B.value, 5) -> NULL, over PATTERN (A B{2})."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_NAV_OFFSET_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# WITHIN through the SQL surface (round-7 coverage closer): the clause
# is parsed (sql_match.py WITHIN) and enforced (nfa.py within-window
# kill) but no oracle query exercised the SQL→NFA wiring end-to-end.
# Strict SQL row-pattern contiguity makes the oracle exact: a match is
# two CONSECUTIVE partition rows click→purchase whose time span is at
# most 30 minutes — an event past the window kills the run BEFORE it
# can consume (span strictly greater than the window), so span == 30
# minutes exactly still matches on both sides.
# Reference: MATCH_RECOGNIZE time constraint, `docs/dev/table/
# streaming/match_recognize.md` WITHIN section; NFAs get the bound via
# `flink-cep/.../nfa/NFA.java` window-time pruning.
# --------------------------------------------------------------------------
_MR_WITHIN_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_id)   OVER w AS nid,
         lead(event_type) OVER w AS ntype,
         lead(ts)         OVER w AS nts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       CAST(event_id AS BIGINT) AS start_id,
       CAST(nid      AS BIGINT) AS end_id
FROM o
WHERE event_type = 'click' AND ntype = 'purchase'
  AND nts <= ts + INTERVAL 30 MINUTE
"""

_SQL_MR_WITHIN_TEXT = """
SELECT user_id, CAST(start_id AS BIGINT) AS start_id,
       CAST(end_id AS BIGINT) AS end_id
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(C.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A C)
  WITHIN INTERVAL '30' MINUTE
  DEFINE A AS A.event_type = 'click',
         C AS C.event_type = 'purchase'
) AS m
"""


@register("flink_sql_mr_within_interval", _MR_WITHIN_ORACLE)
def flink_sql_mr_within_interval(spark, sf_dir):
    """MATCH_RECOGNIZE WITHIN INTERVAL through the SQL surface: the
    window bound drops consecutive click→purchase pairs spanning more
    than 30 minutes."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_WITHIN_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# AFTER MATCH SKIP PAST LAST ROW through the SQL surface (round-7
# coverage closer — the existing skip queries use TO NEXT ROW or the
# Pattern facade).  PATTERN (A B) where BOTH stages accept value < 50:
# inside a maximal run of k consecutive sub-50 rows, TO NEXT ROW would
# emit every adjacent pair (k-1 matches) while PAST LAST ROW restarts
# AFTER each match's B, emitting the non-overlapping pairs at even
# offsets — floor(k/2) matches.  The oracle rebuilds exactly that with
# gaps-and-islands + offset parity.
# Reference: `flink-cep/.../nfa/aftermatch/SkipPastLastStrategy.java`.
# --------------------------------------------------------------------------
_MR_SKIP_PAST_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
low AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
           AS grp
  FROM o WHERE value < 50),
pos AS (
  SELECT user_id, grp, event_id, rn,
         row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) - 1
           AS off
  FROM low)
SELECT p.user_id,
       CAST(p.event_id AS BIGINT) AS start_id,
       CAST(q.event_id AS BIGINT) AS end_id
FROM pos p JOIN pos q
  ON q.user_id = p.user_id AND q.grp = p.grp AND q.off = p.off + 1
WHERE p.off % 2 = 0
"""

_SQL_MR_SKIP_PAST_TEXT = """
SELECT user_id, CAST(start_id AS BIGINT) AS start_id,
       CAST(end_id AS BIGINT) AS end_id
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B)
  DEFINE A AS A.value < 50,
         B AS B.value < 50
) AS m
"""


@register("flink_sql_mr_skip_past_last", _MR_SKIP_PAST_ORACLE)
def flink_sql_mr_skip_past_last(spark, sf_dir):
    """AFTER MATCH SKIP PAST LAST ROW through the SQL surface:
    non-overlapping pair tiling of each consecutive sub-50 run."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_SKIP_PAST_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Timed-out partial matches (TimedOutPartialMatchHandler /
# PatternStream.flatSelect(timeoutTag, ...)): signup -> click -> purchase
# within 2 days; emit the window-expired partial runs with the depth they
# reached.  A run times out when an event for its key arrives past
# start + window (event-time advance, the reference's watermark); the
# oracle therefore requires such a later event to exist.
# --------------------------------------------------------------------------
_TIMEOUT_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events),
s AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'signup'),
sc AS (
  SELECT s.user_id, s.event_id AS start_id, s.ts AS s_ts,
         c.event_id AS c_id, c.ts AS c_ts
  FROM s LEFT JOIN LATERAL (
    SELECT event_id, ts FROM ev c
    WHERE c.user_id = s.user_id AND c.event_type = 'click'
      AND (c.ts, c.event_id) > (s.ts, s.event_id)
    ORDER BY c.ts, c.event_id LIMIT 1) c ON TRUE),
scp AS (
  SELECT sc.*, p.event_id AS p_id, p.ts AS p_ts
  FROM sc LEFT JOIN LATERAL (
    SELECT event_id, ts FROM ev p
    WHERE p.user_id = sc.user_id AND p.event_type = 'purchase'
      AND (p.ts, p.event_id) > (sc.c_ts, sc.c_id)
    ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE)
SELECT x.user_id, x.start_id,
       CASE WHEN x.c_id IS NOT NULL AND x.c_ts <= x.s_ts + INTERVAL 2 DAY
            THEN x.c_id ELSE x.start_id END AS end_id,
       CAST(CASE WHEN x.c_id IS NOT NULL
                  AND x.c_ts <= x.s_ts + INTERVAL 2 DAY
            THEN 2 ELSE 1 END AS INT) AS n_events
FROM scp x
WHERE EXISTS (SELECT 1 FROM ev e
              WHERE e.user_id = x.user_id
                AND e.ts > x.s_ts + INTERVAL 2 DAY)
  AND NOT (x.c_id IS NOT NULL AND x.c_ts <= x.s_ts + INTERVAL 2 DAY
           AND x.p_id IS NOT NULL AND x.p_ts <= x.s_ts + INTERVAL 2 DAY)
"""


@register("cep_timeout_partial_matches", _TIMEOUT_ORACLE)
def cep_timeout_partial_matches(spark, sf_dir):
    """Timeout side output (``TimedOutPartialMatchHandler.java`` /
    ``PatternStream.java`` timeoutTag overloads): partial matches the
    within-window expired, with the prefix depth they reached (1 =
    signup only, 2 = signup+click)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click")
         .followed_by("purchase").within(2 * 24 * 60)
         .match_stream(ev, emit_timeouts=True))
    return run_to_completion(
        m.filter("timed_out").select("user_id", "start_id", "end_id",
                                     "n_events"), "append")


# --------------------------------------------------------------------------
# allowCombinations (Quantifier.java / Pattern.java:389): every
# order-preserving subsequence of qualifying loop events forms its own
# match.  view[value>100]+ (combinations) -> purchase within 7 days;
# output = matches per user.  Oracle: the loop's SKIP_TILL_ANY ignore
# edge keeps every subset run alive THROUGH a purchase (it matches later
# purchases again), so for each purchase the candidates are ALL views
# before it; v of them satisfy the window from their own start
# (window expiry kills a subset at its min element's deadline), and the
# subsets with an in-window minimum element number 2^v - 1.
# --------------------------------------------------------------------------
_COMBINATIONS_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type, value FROM events),
p AS (SELECT user_id, event_id, ts
      FROM ev WHERE event_type = 'purchase'),
v AS (SELECT p.user_id, p.event_id AS p_id, count(*) AS vcnt
      FROM p JOIN ev a ON a.user_id = p.user_id
       AND a.event_type = 'view' AND a.value > 100
       AND (a.ts, a.event_id) < (p.ts, p.event_id)
       AND p.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY 1, 2)
SELECT user_id,
       CAST(SUM(CAST(POWER(2, vcnt) AS BIGINT) - 1) AS BIGINT) AS n_matches
FROM v GROUP BY user_id
"""


@register("cep_allow_combinations", _COMBINATIONS_ORACLE)
def cep_allow_combinations(spark, sf_dir):
    """``oneOrMore().allowCombinations()`` through the generic NFA:
    the pre-take run survives each continuing loop take, so the runs
    enumerate every subsequence of the qualifying views; the loop's
    SKIP_TILL_ANY ignore edge keeps those runs alive through each
    purchase, matching every later closing too until the window
    expires (``Quantifier.java`` combinations; the dedicated
    two-stage operators keep their deterministic semantics)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("view").where("value > 100").one_or_more()
         .allow_combinations().followed_by("purchase")
         .within(7 * 24 * 60).match_stream(ev))
    batch = run_to_completion(m, "append")
    return (batch.groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_matches")))


# --------------------------------------------------------------------------
# Relaxed-loop PROCEED branching (the reference's contiguity table,
# docs/dev/libs/cep.md + NFACompiler.java:827): signup click+ purchase
# within 7 days emits every stop-early prefix, and the loop branch
# survives each purchase (its IGNORE edge) to match later closings.
# Oracle: two row families —
#   full:  for each purchase p in-window after signup a, the open run
#          holds ALL clicks between a and p (>= 1 of them);
#   fork:  closing the loop at prefix length k >= 1 happens when click
#          k+1 is taken (in-window), and that closed state matches the
#          FIRST purchase after click k+1 (in-window).
# --------------------------------------------------------------------------
_LOOP_PREFIX_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events),
s AS (SELECT user_id, event_id AS a_id, ts AS a_ts
      FROM ev WHERE event_type = 'signup'),
ck AS (SELECT s.user_id, s.a_id, s.a_ts, c.event_id AS c_id, c.ts AS c_ts,
              row_number() OVER (PARTITION BY s.user_id, s.a_id
                                 ORDER BY c.ts, c.event_id) AS rn
       FROM s JOIN ev c ON c.user_id = s.user_id AND c.event_type = 'click'
        AND (c.ts, c.event_id) > (s.a_ts, s.a_id)),
full_m AS (
  SELECT s.user_id, s.a_id AS start_id, p.event_id AS end_id,
         CAST(2 + (SELECT count(*) FROM ev c
                   WHERE c.user_id = s.user_id AND c.event_type = 'click'
                     AND (c.ts, c.event_id) > (s.a_ts, s.a_id)
                     AND (c.ts, c.event_id) < (p.ts, p.event_id)) AS INT)
           AS n_events
  FROM s JOIN ev p ON p.user_id = s.user_id AND p.event_type = 'purchase'
   AND (p.ts, p.event_id) > (s.a_ts, s.a_id)
   AND p.ts <= s.a_ts + INTERVAL 7 DAY),
fork_m AS (
  SELECT k.user_id, k.a_id AS start_id, p.event_id AS end_id,
         CAST(k.rn + 1 AS INT) AS n_events
  FROM ck k JOIN LATERAL (
    SELECT event_id, ts FROM ev p
    WHERE p.user_id = k.user_id AND p.event_type = 'purchase'
      AND (p.ts, p.event_id) > (k.c_ts, k.c_id)
    ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE
  WHERE k.rn >= 2 AND k.c_ts <= k.a_ts + INTERVAL 7 DAY
    AND p.ts <= k.a_ts + INTERVAL 7 DAY)
SELECT user_id, start_id, end_id, n_events FROM full_m WHERE n_events >= 3
UNION ALL
SELECT user_id, start_id, end_id, n_events FROM fork_m
"""


@register("cep_nfa_loop_prefix_matches", _LOOP_PREFIX_ORACLE)
def cep_nfa_loop_prefix_matches(spark, sf_dir):
    """Mid-pattern relaxed loop with full reference edge semantics:
    stop-early prefixes via the persisted PROCEED state and loop
    survival across closings via its IGNORE edge
    (``NFACompiler.java:827``; ``NFA.java:574`` IGNORE-after-PROCEED)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click").one_or_more()
         .followed_by("purchase").within(7 * 24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Leading optional (Pattern.begin(..).optional()): the start state
# PROCEEDs through the optional, so a purchase alone matches (1 event)
# and each view also pairs with its first following purchase in-window
# (2 events) — both branches, the CEP-library contract.
# --------------------------------------------------------------------------
_LEADING_OPT_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT v.user_id, v.event_id AS start_id, p.event_id AS end_id,
       CAST(2 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'view') v
JOIN LATERAL (
  SELECT event_id, ts FROM ev p
  WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
    AND (p.ts, p.event_id) > (v.ts, v.event_id)
  ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE
WHERE p.ts <= v.ts + INTERVAL 3 DAY
UNION ALL
SELECT user_id, event_id AS start_id, event_id AS end_id,
       CAST(1 AS INT) AS n_events
FROM ev WHERE event_type = 'purchase'
"""


@register("cep_leading_optional", _LEADING_OPT_ORACLE)
def cep_leading_optional(spark, sf_dir):
    """view?.purchase within 3 days through the generic NFA: runs begin
    at the optional view AND directly at the purchase stage
    (start-state PROCEED through leading optionals)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("view").optional().followed_by("purchase")
         .within(3 * 24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Group pattern with a bounded quantifier (GroupPattern.java;
# Pattern.begin(Pattern).times(2)): (click purchase){2} within 14 days,
# unrolled to four mandatory relaxed stages.
# --------------------------------------------------------------------------
_GROUP_TIMES_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT c1.user_id, c1.event_id AS start_id, p2.event_id AS end_id,
       CAST(4 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'click') c1,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = c1.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) > (c1.ts, c1.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p1,
LATERAL (SELECT event_id, ts FROM ev c
         WHERE c.user_id = c1.user_id AND c.event_type = 'click'
           AND (c.ts, c.event_id) > (p1.ts, p1.event_id)
         ORDER BY c.ts, c.event_id LIMIT 1) c2,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = c1.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) > (c2.ts, c2.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p2
WHERE p2.ts <= c1.ts + INTERVAL 14 DAY
"""


@register("cep_group_pattern_times", _GROUP_TIMES_ORACLE)
def cep_group_pattern_times(spark, sf_dir):
    """Bounded group quantifier via compile-time unrolling
    (``GroupPattern.java``): (click purchase){2} is exactly the
    four-stage relaxed chain."""
    ev = read_stream_table(spark, sf_dir, "events")
    sub = Pattern.begin("click").followed_by("purchase")
    m = (Pattern.begin_pattern(sub, times=2).within(14 * 24 * 60)
         .match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# SQL:2016 SUBSET union variables in MEASURES — an EXCEEDS-reference
# surface (the reference documents SUBSET as unsupported,
# docs/dev/table/streaming/match_recognize.md): S = (A, C) aggregates
# over the rows mapped to either variable.
# --------------------------------------------------------------------------
_SQL_MR_SUBSET_TEXT = """
SELECT user_id, CAST(match_no AS BIGINT) AS match_no,
       s_sum, s_cnt, n_b
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES SUM(S.value) AS s_sum, COUNT(S.*) AS s_cnt,
           COUNT(B.*) AS n_b, MATCH_NUMBER() AS match_no
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B+ C)
  SUBSET S = (A, C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view',
         C AS event_type = 'purchase' AND C.value > 10
) AS m
"""

_MR_SUBSET_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT a.user_id, a.rn AS a_rn, nx.rn AS c_rn,
         a.value AS a_val, nx.value AS c_val
  FROM (SELECT * FROM o WHERE event_type = 'click') a,
  LATERAL (SELECT rn, event_type, value FROM o x
           WHERE x.user_id = a.user_id AND x.rn > a.rn
             AND x.event_type <> 'view'
           ORDER BY x.rn LIMIT 1) nx
  WHERE nx.event_type = 'purchase' AND nx.value > 10 AND nx.rn > a.rn + 1)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY a_rn) AS BIGINT)
         AS match_no,
       CAST(CAST(a_val AS DECIMAL(18,2)) + CAST(c_val AS DECIMAL(18,2))
            AS DOUBLE) AS s_sum,
       CAST(2 AS BIGINT) AS s_cnt,
       CAST((SELECT count(*) FROM o b
             WHERE b.user_id = m.user_id AND b.rn > m.a_rn AND b.rn < m.c_rn)
            AS BIGINT) AS n_b
FROM m
"""


@register("flink_sql_mr_subset_union", _MR_SUBSET_ORACLE)
def flink_sql_mr_subset_union(spark, sf_dir):
    """SUBSET S = (A, C) through the SQL surface: SUM/COUNT over the
    union variable (rows mapped to ANY member — SQL:2016 SUBSET;
    beyond the reference's documented MR surface)."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_SUBSET_TEXT,
        batch_df=t(spark, sf_dir, "events"),
        stream_df=read_stream_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Inner-vs-outer contiguity through the generic NFA: signup
# click{2}.consecutive() purchase within 7 days.  consecutive() hardens
# only BETWEEN the two clicks (they must be position-adjacent per user);
# the seam signup->click1 stays relaxed (first click after the signup,
# gaps allowed).  Exact times(2) means no stop-early prefixes: one
# deterministic chance per signup.
# --------------------------------------------------------------------------
_CONSEC_SEAM_ORACLE = """
WITH o AS (SELECT user_id, event_id, ts, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
s AS (SELECT user_id, event_id AS start_id, ts AS s_ts, rn
      FROM o WHERE event_type = 'signup'),
c1 AS (SELECT s.*, c.rn AS c1_rn FROM s JOIN LATERAL (
        SELECT rn FROM o c
        WHERE c.user_id = s.user_id AND c.event_type = 'click'
          AND c.rn > s.rn
        ORDER BY c.rn LIMIT 1) c ON TRUE),
c2 AS (SELECT c1.*, n.rn AS c2_rn FROM c1 JOIN o n
        ON n.user_id = c1.user_id AND n.rn = c1.c1_rn + 1
       AND n.event_type = 'click')
SELECT c2.user_id, c2.start_id, p.event_id AS end_id,
       CAST(4 AS INT) AS n_events
FROM c2 JOIN LATERAL (
   SELECT event_id, ts FROM o p
   WHERE p.user_id = c2.user_id AND p.event_type = 'purchase'
     AND p.rn > c2.c2_rn
   ORDER BY p.rn LIMIT 1) p ON TRUE
WHERE p.ts <= c2.s_ts + INTERVAL 7 DAY
"""


@register("cep_consecutive_times_seam", _CONSEC_SEAM_ORACLE)
def cep_consecutive_times_seam(spark, sf_dir):
    """times(2).consecutive() mid-pattern: the inner strategy is strict
    (adjacent clicks), the entry seam relaxed (Quantifier inner vs
    outer consuming strategies, NFACompiler.java:791/:827)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click").times(2)
         .consecutive().followed_by("purchase").within(7 * 24 * 60)
         .match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# QUANTIFIED group patterns (GroupPattern.java:30 — Quantifier applied
# to Pattern.begin/followedBy(Pattern), compiled to NFA group loop-back
# edges rather than unrolled copies).
#
# Optional group: signup ((click purchase))? error — the skip branch is
# materialized as its own computation state at signup-take time, so the
# short {signup, error} match survives the group branch consuming
# clicks.  The oracle derives both branches independently: short = first
# error after the signup; long = first click, then first purchase, then
# first error, chained by (ts, event_id) position.
# --------------------------------------------------------------------------
_GROUP_OPT_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events)
SELECT s.user_id, s.event_id AS start_id, e1.event_id AS end_id,
       CAST(2 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'signup') s,
LATERAL (SELECT event_id FROM ev e
         WHERE e.user_id = s.user_id AND e.event_type = 'error'
           AND (e.ts, e.event_id) > (s.ts, s.event_id)
         ORDER BY e.ts, e.event_id LIMIT 1) e1
UNION ALL
SELECT s.user_id, s.event_id AS start_id, e2.event_id AS end_id,
       CAST(4 AS INT) AS n_events
FROM (SELECT * FROM ev WHERE event_type = 'signup') s,
LATERAL (SELECT event_id, ts FROM ev c
         WHERE c.user_id = s.user_id AND c.event_type = 'click'
           AND (c.ts, c.event_id) > (s.ts, s.event_id)
         ORDER BY c.ts, c.event_id LIMIT 1) c1,
LATERAL (SELECT event_id, ts FROM ev p
         WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
           AND (p.ts, p.event_id) > (c1.ts, c1.event_id)
         ORDER BY p.ts, p.event_id LIMIT 1) p1,
LATERAL (SELECT event_id FROM ev e
         WHERE e.user_id = s.user_id AND e.event_type = 'error'
           AND (e.ts, e.event_id) > (p1.ts, p1.event_id)
         ORDER BY e.ts, e.event_id LIMIT 1) e2
"""


@register("cep_group_pattern_optional", _GROUP_OPT_ORACLE)
def cep_group_pattern_optional(spark, sf_dir):
    """Optional group quantifier on the NFA group edges
    (``GroupPattern.optional``): signup ((click purchase))? error emits
    BOTH the whole-group-skip match and the consumed-group match per
    signup anchor."""
    ev = read_stream_table(spark, sf_dir, "events")
    sub = Pattern.begin("click").followed_by("purchase")
    m = (Pattern.begin("signup").followed_by_pattern(sub).group_optional()
         .followed_by("error").match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Group LOOP: signup ((click purchase))+ trailing — one prefix match per
# completed repetition (the reference's partial-match emission per
# iteration).  The rep chain is deterministic under relaxed seams
# (first click after the previous rep, first purchase after that
# click), so the oracle walks precomputed step edges with a recursive
# CTE: step(from -> rep-completing purchase), closure from each signup.
# --------------------------------------------------------------------------
_GROUP_OOM_ORACLE = """
WITH RECURSIVE
ev AS (SELECT user_id, event_id, ts, event_type FROM events),
step AS (
  SELECT e.user_id, e.event_id AS from_id, p2.event_id AS to_id,
         p2.ts AS to_ts
  FROM (SELECT user_id, event_id, ts FROM ev
        WHERE event_type IN ('signup', 'purchase')) e,
  LATERAL (SELECT event_id, ts FROM ev c
           WHERE c.user_id = e.user_id AND c.event_type = 'click'
             AND (c.ts, c.event_id) > (e.ts, e.event_id)
           ORDER BY c.ts, c.event_id LIMIT 1) c1,
  LATERAL (SELECT event_id, ts FROM ev p
           WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
             AND (p.ts, p.event_id) > (c1.ts, c1.event_id)
           ORDER BY p.ts, p.event_id LIMIT 1) p2),
chain(user_id, start_id, end_id, reps) AS (
  SELECT st.user_id, s.event_id, st.to_id, 1
  FROM ev s JOIN step st
    ON st.user_id = s.user_id AND st.from_id = s.event_id
  WHERE s.event_type = 'signup'
  UNION ALL
  SELECT ch.user_id, ch.start_id, st.to_id, ch.reps + 1
  FROM chain ch JOIN step st
    ON st.user_id = ch.user_id AND st.from_id = ch.end_id)
SELECT user_id, start_id, end_id, CAST(1 + 2 * reps AS INT) AS n_events
FROM chain
"""


@register("cep_group_pattern_one_or_more", _GROUP_OOM_ORACLE)
def cep_group_pattern_one_or_more(spark, sf_dir):
    """Unbounded group loop on the NFA loop-back edges
    (``GroupPattern.oneOrMore``): signup ((click purchase))+ emits one
    prefix match per completed repetition, repetitions chained by the
    relaxed loop-back seam."""
    ev = read_stream_table(spark, sf_dir, "events")
    sub = Pattern.begin("click").followed_by("purchase")
    m = (Pattern.begin("signup").followed_by_pattern(sub)
         .group_one_or_more().match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# ORDER BY with a DESCENDING tiebreaker (round-8 closer): the reference
# accepts arbitrary collations after the rowtime
# (StreamExecMatch.scala:69).  Event time is truncated to the hour so
# same-hour rows are ordered by (value DESC, event_id) — SQL row-pattern
# adjacency then pairs each >=50 row with the next lower-valued row,
# which an ascending collation would pair differently.
# --------------------------------------------------------------------------
_MR_DESC_TB_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, value,
         lead(value)    OVER w AS nv,
         lead(event_id) OVER w AS nid
  FROM (SELECT user_id, event_id, value, date_trunc('hour', ts) AS ts_h
        FROM events)
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_h, value DESC, event_id))
SELECT user_id,
       CAST(event_id AS BIGINT) AS start_id,
       CAST(nid      AS BIGINT) AS end_id,
       value AS high_val, nv AS low_val
FROM o
WHERE value >= 50 AND nv < 50
"""

_SQL_MR_DESC_TB_TEXT = """
SELECT user_id, start_id, end_id, high_val, low_val
FROM ev MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts_h, value DESC, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id,
           FIRST(A.value) AS high_val, LAST(B.value) AS low_val
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS A.value >= 50,
         B AS B.value < 50
) AS m
"""


@register("flink_sql_mr_order_desc_tiebreaker", _MR_DESC_TB_ORACLE)
def flink_sql_mr_order_desc_tiebreaker(spark, sf_dir):
    """MATCH_RECOGNIZE with ORDER BY ts_h, value DESC, event_id — a
    descending non-time tiebreaker reorders same-hour rows, changing
    which rows are pattern-adjacent (the round-7 verdict's narrowing,
    now lifted: sql_match.py accepts DESC and expression tiebreakers
    after the rowtime)."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    ev = t(spark, sf_dir, "events").withColumn(
        "ts_h", F.date_trunc("hour", F.col("ts")))
    return execute_match_recognize_sql(spark, _SQL_MR_DESC_TB_TEXT,
                                       batch_df=ev)


# --------------------------------------------------------------------------
# Group loop with a STRICT seam (Pattern.next(Pattern).oneOrMore()):
# signup next((click purchase))+ — the group's first stage keeps the
# next() contiguity, so BOTH the entry (click immediately after signup)
# and every loop-back (next rep's click immediately after the previous
# purchase) are strict, while the inner click->purchase seam stays
# relaxed.  Oracle: lead() finds each anchor's immediate successor; a
# step edge exists only when that successor is a click, and the rep
# then closes at the first purchase after it; chains via recursive CTE.
# --------------------------------------------------------------------------
_GROUP_STRICT_SEAM_ORACLE = """
WITH RECURSIVE
ev AS (SELECT user_id, event_id, ts, event_type FROM events),
nx AS (SELECT user_id, event_id, ts, event_type,
              lead(event_id)   OVER w AS nid,
              lead(event_type) OVER w AS ntype,
              lead(ts)         OVER w AS nts
       FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
step AS (
  SELECT e.user_id, e.event_id AS from_id, p2.event_id AS to_id
  FROM (SELECT user_id, event_id, nid, nts FROM nx
        WHERE event_type IN ('signup', 'purchase')
          AND ntype = 'click') e,
  LATERAL (SELECT event_id, ts FROM ev p
           WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
             AND (p.ts, p.event_id) > (e.nts, e.nid)
           ORDER BY p.ts, p.event_id LIMIT 1) p2),
chain(user_id, start_id, end_id, reps) AS (
  SELECT st.user_id, s.event_id, st.to_id, 1
  FROM ev s JOIN step st
    ON st.user_id = s.user_id AND st.from_id = s.event_id
  WHERE s.event_type = 'signup'
  UNION ALL
  SELECT ch.user_id, ch.start_id, st.to_id, ch.reps + 1
  FROM chain ch JOIN step st
    ON st.user_id = ch.user_id AND st.from_id = ch.end_id)
SELECT user_id, start_id, end_id, CAST(1 + 2 * reps AS INT) AS n_events
FROM chain
"""


@register("cep_group_pattern_strict_seam", _GROUP_STRICT_SEAM_ORACLE)
def cep_group_pattern_strict_seam(spark, sf_dir):
    """Group loop whose entry AND loop-back seams are strict
    (``Pattern.next(Pattern)`` + ``GroupPattern.oneOrMore``): rep
    sequences chain only while each rep's click immediately follows
    the previous anchor; prefix match per completed rep."""
    ev = read_stream_table(spark, sf_dir, "events")
    sub = Pattern.begin("click").followed_by("purchase")
    m = (Pattern.begin("signup").next_pattern(sub).group_one_or_more()
         .match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# Trailing GREEDY relaxed loop closed by the WITHIN window (round-8
# emission semantics): signup click+.greedy() within 2 days.  The
# window closing IS the loop-closing condition — the maximal click set
# emits as a NORMAL match when the first same-key event past the
# window arrives (event-driven expiry; a key with no later event holds
# its run open, the facade's unbounded contract).  Oracle: per signup,
# all clicks inside the window, emitted iff a later same-key event
# strictly past the window exists.
# --------------------------------------------------------------------------
_TRAILING_GREEDY_CLOSE_ORACLE = """
WITH ev AS (SELECT user_id, event_id, ts, event_type FROM events),
s AS (SELECT user_id, event_id, ts FROM ev WHERE event_type = 'signup'),
m AS (
  SELECT s.user_id, s.event_id AS start_id,
         max_by(c.event_id,
                CAST(epoch_us(c.ts) AS HUGEINT) * 1000000000
                + c.event_id) AS end_id,
         CAST(1 + count(*) AS INT) AS n_events
  FROM s JOIN ev c
    ON c.user_id = s.user_id AND c.event_type = 'click'
   AND (c.ts, c.event_id) > (s.ts, s.event_id)
   AND c.ts <= s.ts + INTERVAL 2 DAY
  GROUP BY s.user_id, s.event_id, s.ts
  HAVING EXISTS (SELECT 1 FROM ev e
                 WHERE e.user_id = s.user_id
                   AND e.ts > s.ts + INTERVAL 2 DAY))
SELECT user_id, start_id, end_id, n_events FROM m
"""


@register("cep_trailing_greedy_window_close", _TRAILING_GREEDY_CLOSE_ORACLE)
def cep_trailing_greedy_window_close(spark, sf_dir):
    """signup click+.greedy() within 48h: the maximal in-window click
    set emits as a normal match when the window expires on the run
    (the round-8 trailing-greedy emission rule — previously these runs
    were silently dropped)."""
    ev = read_stream_table(spark, sf_dir, "events")
    m = (Pattern.begin("signup").followed_by("click").one_or_more()
         .greedy().within(2 * 24 * 60).match_stream(ev))
    return run_to_completion(
        m.select("user_id", "start_id", "end_id", "n_events"), "append")


# --------------------------------------------------------------------------
# SQL PATTERN (A B+) with the tail match at partition end (round-8 EOS
# sentinel): maximal consecutive view-runs immediately after a click,
# SQL:2016 strict contiguity + greedy quantifier.  Oracle:
# gaps-and-islands over the per-user row sequence — each view island
# whose immediate predecessor row is a click is exactly one match.
# --------------------------------------------------------------------------
_MR_TRAILING_PLUS_ORACLE = """
WITH o AS (SELECT user_id, event_id, event_type,
                  row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
vi AS (SELECT user_id, rn, event_id,
              rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
                AS grp
       FROM o WHERE event_type = 'view'),
isl AS (SELECT user_id, grp, min(rn) AS lo,
               max_by(event_id, rn) AS end_id,
               CAST(count(*) AS BIGINT) AS n_b
        FROM vi GROUP BY user_id, grp)
SELECT i.user_id, c.event_id AS start_id, i.end_id, i.n_b
FROM isl i JOIN o c
  ON c.user_id = i.user_id AND c.rn = i.lo - 1 AND c.event_type = 'click'
"""

_SQL_MR_TRAILING_PLUS_TEXT = """
SELECT user_id, start_id, end_id, n_b
FROM ev MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES FIRST(A.event_id) AS start_id, LAST(B.event_id) AS end_id,
           COUNT(B.*) AS n_b
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B+)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view'
) AS m
"""


@register("flink_sql_mr_trailing_plus_tail", _MR_TRAILING_PLUS_ORACLE)
def flink_sql_mr_trailing_plus_tail(spark, sf_dir):
    """PATTERN (A B+): maximal consecutive view-runs after each click.
    Mid-table runs close on the first non-view row (strict greedy
    backtracking); a run still open at the partition's last row emits
    via the bounded replay's end-of-stream sentinel — the round-8
    SQL:2016 batch-semantics closer."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_TRAILING_PLUS_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# MATCH_RECOGNIZE aggregations in DEFINE (round 9): the reference's
# flagship Aggregations example shape (match_recognize.md:263-330,
# MatchCodeGenerator.scala aggregate codegen) — PATTERN (A+ B) with
# A AS AVG(A.value) < 40 accumulates rows while the RUNNING average
# (current row included) stays below the threshold; the first breaking
# row is B (default-TRUE DEFINE, md:257).  AFTER MATCH SKIP PAST LAST
# ROW + SQL leftmost preferment (a younger run's early completion is
# held and discarded while an older run extends — NFA.java:364's
# completedMatches queue) make matches exactly the sequential fold the
# oracle computes with a recursive CTE: one state row per (user, rn),
# emitting (start, break) whenever the running average would leave the
# band.  Both engines accumulate the PREDICATE's run sum in the same
# row order, so the threshold decisions agree bit-for-bit; the REPORTED
# average derives from an exact decimal SUM on both sides (558-row runs
# exist at sf0.1 — a float pairwise-vs-sequential sum difference can
# cross a ROUND(x, 6) boundary there, the repo's standing money-column
# convention avoids it).
# --------------------------------------------------------------------------
_MR_AGG_AVG_ORACLE = """
WITH RECURSIVE
ev AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
st AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS cnt,
         CAST(0 AS DOUBLE) AS sm, CAST(NULL AS BIGINT) AS start_rn,
         CAST(NULL AS BIGINT) AS em_start, CAST(NULL AS BIGINT) AS em_end,
         CAST(NULL AS DOUBLE) AS em_sum, CAST(NULL AS INT) AS em_cnt
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT s.user_id, e.rn,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) < 40 THEN s.cnt + 1
              ELSE 0 END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) < 40 THEN s.sm + e.value
              ELSE CAST(0 AS DOUBLE) END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) < 40
              THEN coalesce(s.start_rn, e.rn) END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) >= 40 AND s.cnt > 0
              THEN s.start_rn END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) >= 40 AND s.cnt > 0
              THEN e.rn END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) >= 40 AND s.cnt > 0
              THEN s.sm END,
         CASE WHEN (s.sm + e.value) / (s.cnt + 1) >= 40 AND s.cnt > 0
              THEN s.cnt END
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
SELECT s.user_id, e1.ts AS start_t, e2.ts AS end_t,
       ROUND(CAST(SUM(CAST(ea.value AS DECIMAL(18,2))) AS DOUBLE)
             / s.em_cnt, 6) AS avg_val,
       CAST(s.em_cnt AS BIGINT) AS n_a
FROM st s
JOIN ev e1 ON e1.user_id = s.user_id AND e1.rn = s.em_start
JOIN ev e2 ON e2.user_id = s.user_id AND e2.rn = s.em_end - 1
JOIN ev ea ON ea.user_id = s.user_id
          AND ea.rn BETWEEN s.em_start AND s.em_end - 1
WHERE s.em_start IS NOT NULL
GROUP BY s.user_id, e1.ts, e2.ts, s.em_cnt
"""

_SQL_MR_AGG_AVG_TEXT = """
SELECT user_id, start_t, end_t, ROUND(sum_val / n_cnt, 6) AS avg_val, n_a
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.ts) AS start_t, LAST(A.ts) AS end_t,
           SUM(A.value) AS sum_val, COUNT(A.value) AS n_cnt,
           COUNT(A.*) AS n_a
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A+ B)
  DEFINE A AS AVG(A.value) < 40
)
"""


@register("flink_sql_mr_define_agg_avg", _MR_AGG_AVG_ORACLE)
def flink_sql_mr_define_agg_avg(spark, sf_dir):
    """RUNNING AVG in DEFINE — the reference docs' flagship aggregate
    pattern (match_recognize.md:278: longest period the average price
    stays under a threshold), with B left to the default-TRUE DEFINE
    and the leftmost-preferment held emission it requires."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_AGG_AVG_TEXT, batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Aggregate over an EXPRESSION argument (md:326: valid iff it references
# a single pattern variable) in BOTH clauses: DEFINE accumulates
# SUM(A.value * A.value) (sum of squares) and MEASURES reports it.
# --------------------------------------------------------------------------
_MR_AGG_SUMSQ_ORACLE = """
WITH RECURSIVE
ev AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
st AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS cnt,
         CAST(0 AS DOUBLE) AS ss, CAST(NULL AS BIGINT) AS start_rn,
         CAST(NULL AS BIGINT) AS em_start, CAST(NULL AS BIGINT) AS em_end,
         CAST(NULL AS DOUBLE) AS em_ss, CAST(NULL AS INT) AS em_cnt
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT s.user_id, e.rn,
         CASE WHEN s.ss + e.value * e.value < 5000 THEN s.cnt + 1
              ELSE 0 END,
         CASE WHEN s.ss + e.value * e.value < 5000
              THEN s.ss + e.value * e.value ELSE CAST(0 AS DOUBLE) END,
         CASE WHEN s.ss + e.value * e.value < 5000
              THEN coalesce(s.start_rn, e.rn) END,
         CASE WHEN s.ss + e.value * e.value >= 5000 AND s.cnt > 0
              THEN s.start_rn END,
         CASE WHEN s.ss + e.value * e.value >= 5000 AND s.cnt > 0
              THEN e.rn END,
         CASE WHEN s.ss + e.value * e.value >= 5000 AND s.cnt > 0
              THEN s.ss END,
         CASE WHEN s.ss + e.value * e.value >= 5000 AND s.cnt > 0
              THEN s.cnt END
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
SELECT s.user_id, e1.ts AS start_t,
       ROUND(s.em_ss, 6) AS sum_sq,
       CAST(s.em_cnt AS BIGINT) AS n_a
FROM st s
JOIN ev e1 ON e1.user_id = s.user_id AND e1.rn = s.em_start
WHERE s.em_start IS NOT NULL
"""

_SQL_MR_AGG_SUMSQ_TEXT = """
SELECT user_id, start_t, ROUND(sum_sq, 6) AS sum_sq, n_a
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.ts) AS start_t,
           SUM(A.value * A.value) AS sum_sq, COUNT(A.*) AS n_a
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A+ B)
  DEFINE A AS SUM(A.value * A.value) < 5000
)
"""


@register("flink_sql_mr_define_agg_sum_expr", _MR_AGG_SUMSQ_ORACLE)
def flink_sql_mr_define_agg_sum_expr(spark, sf_dir):
    """Expression-argument aggregate (``SUM(A.value * A.value)``) in
    DEFINE and MEASURES — the single-variable expression rule the
    reference documents at match_recognize.md:326."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_AGG_SUMSQ_TEXT, batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Two aggregates combined in ONE DEFINE predicate: MAX - MIN bounds the
# run's value spread.  Exact float min/max on both sides — no
# accumulation-order sensitivity at all, so values compare unrounded.
# --------------------------------------------------------------------------
_MR_AGG_MINMAX_ORACLE = """
WITH RECURSIVE
ev AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
st AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS cnt,
         CAST(NULL AS DOUBLE) AS mn, CAST(NULL AS DOUBLE) AS mx,
         CAST(NULL AS BIGINT) AS start_rn,
         CAST(NULL AS BIGINT) AS em_start, CAST(NULL AS BIGINT) AS em_end,
         CAST(NULL AS DOUBLE) AS em_mn, CAST(NULL AS DOUBLE) AS em_mx,
         CAST(NULL AS INT) AS em_cnt
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT s.user_id, e.rn,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) < 25
              THEN s.cnt + 1 ELSE 0 END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) < 25
              THEN least(coalesce(s.mn, e.value), e.value) END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) < 25
              THEN greatest(coalesce(s.mx, e.value), e.value) END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) < 25
              THEN coalesce(s.start_rn, e.rn) END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) >= 25
                   AND s.cnt > 0 THEN s.start_rn END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) >= 25
                   AND s.cnt > 0 THEN e.rn END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) >= 25
                   AND s.cnt > 0 THEN s.mn END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) >= 25
                   AND s.cnt > 0 THEN s.mx END,
         CASE WHEN greatest(coalesce(s.mx, e.value), e.value)
                   - least(coalesce(s.mn, e.value), e.value) >= 25
                   AND s.cnt > 0 THEN s.cnt END
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
SELECT s.user_id,
       CAST(e1.event_id AS BIGINT) AS start_id,
       s.em_mn AS lo, s.em_mx AS hi, CAST(s.em_cnt AS BIGINT) AS n_a
FROM st s
JOIN ev e1 ON e1.user_id = s.user_id AND e1.rn = s.em_start
WHERE s.em_start IS NOT NULL
"""

_SQL_MR_AGG_MINMAX_TEXT = """
SELECT user_id, start_id, lo, hi, n_a
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.event_id) AS start_id,
           MIN(A.value) AS lo, MAX(A.value) AS hi, COUNT(A.*) AS n_a
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A+ B)
  DEFINE A AS MAX(A.value) - MIN(A.value) < 25
)
"""


@register("flink_sql_mr_define_agg_minmax", _MR_AGG_MINMAX_ORACLE)
def flink_sql_mr_define_agg_minmax(spark, sf_dir):
    """MAX(A.value) - MIN(A.value) < 25 in one DEFINE predicate: two
    running aggregates composed by the predicate grammar (the
    reference compiles aggregate calls as RexNodes inside arbitrary
    DEFINE expressions, MatchCodeGenerator.scala)."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_AGG_MINMAX_TEXT, batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# MATCH_ROWTIME() (match_recognize.md:1036): the last mapped row's
# timestamp as the match's rowtime attribute, consumed by a subsequent
# time-based aggregation (the documented purpose: group windows / joins
# over the match stream).  Strict SQL adjacency makes the oracle a
# lead() pair scan.
# --------------------------------------------------------------------------
_MR_MATCH_ROWTIME_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER w AS nt, lead(ts) OVER w AS nts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, date_trunc('hour', nts) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n_matches
FROM o WHERE event_type = 'click' AND nt = 'purchase'
GROUP BY user_id, date_trunc('hour', nts)
"""

_SQL_MR_MATCH_ROWTIME_TEXT = """
SELECT user_id, date_trunc('HOUR', mrt) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n_matches
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES MATCH_ROWTIME() AS mrt
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'purchase'
) GROUP BY user_id, date_trunc('HOUR', mrt)
"""


@register("flink_sql_mr_match_rowtime", _MR_MATCH_ROWTIME_ORACLE)
def flink_sql_mr_match_rowtime(spark, sf_dir):
    """MATCH_ROWTIME() as the match stream's rowtime: hourly counts of
    click->purchase adjacencies grouped on the matched pair's end
    timestamp (the reference's time-attribute function for subsequent
    windowed operations)."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_MATCH_ROWTIME_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Pattern-API iterative condition (round 9): the CEP facade's where()
# accepts navigation/aggregate text — the analog of the reference's
# IterativeCondition over ctx.getEventsForPattern
# (flink-cep/.../conditions/IterativeCondition.java:56).  A greedy
# click-loop bounded by its RUNNING SUM (a breaking click is IGNORED by
# the relaxed loop and a later smaller click can still fit), closed by
# the next purchase; skip-past-last + leftmost preferment make the
# result the per-user sequential fold the oracle computes.
# --------------------------------------------------------------------------
_CEP_ITER_SUM_ORACLE = """
WITH RECURSIVE
ev AS (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
st AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, 0 AS cnt,
         CAST(0 AS DOUBLE) AS sm, CAST(NULL AS BIGINT) AS start_id,
         CAST(NULL AS BIGINT) AS em_start, CAST(NULL AS BIGINT) AS em_end,
         CAST(NULL AS DOUBLE) AS em_sum, CAST(NULL AS INT) AS em_cnt
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT s.user_id, e.rn,
         CASE WHEN e.event_type = 'click' AND s.sm + e.value < 300
              THEN s.cnt + 1
              WHEN e.event_type = 'purchase' THEN 0
              ELSE s.cnt END,
         CASE WHEN e.event_type = 'click' AND s.sm + e.value < 300
              THEN s.sm + e.value
              WHEN e.event_type = 'purchase' THEN CAST(0 AS DOUBLE)
              ELSE s.sm END,
         CASE WHEN e.event_type = 'click' AND s.sm + e.value < 300
              THEN coalesce(s.start_id, e.event_id)
              WHEN e.event_type = 'purchase' THEN CAST(NULL AS BIGINT)
              ELSE s.start_id END,
         CASE WHEN e.event_type = 'purchase' AND s.cnt > 0
              THEN s.start_id END,
         CASE WHEN e.event_type = 'purchase' AND s.cnt > 0
              THEN e.event_id END,
         CASE WHEN e.event_type = 'purchase' AND s.cnt > 0
              THEN s.sm END,
         CASE WHEN e.event_type = 'purchase' AND s.cnt > 0
              THEN s.cnt END
  FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
SELECT user_id, em_start AS start_id, em_end AS end_id,
       ROUND(em_sum, 6) AS click_sum, CAST(em_cnt AS BIGINT) AS n_clicks
FROM st WHERE em_start IS NOT NULL
"""


@register("cep_iterative_condition_sum", _CEP_ITER_SUM_ORACLE)
def cep_iterative_condition_sum(spark, sf_dir):
    """Pattern facade with an aggregate where(): clicks accumulate
    while SUM(click.value) < 300 (greedy loop, breaking clicks ignored
    under relaxed contiguity), the next purchase completes the match,
    skip-past-last resumes after it.  click_sum/n_clicks are projected
    from the consumed event ids — explode + equi-join the values back
    by id, all JVM-side (the declarative-measures pattern)."""
    from flink_release_1_10_0_spark.queries.helpers import t

    ev = read_stream_table(spark, sf_dir, "events")
    pat = (Pattern.begin("click").one_or_more().greedy()
           .where("SUM(click.value) < 300")
           .followed_by("purchase"))
    m = run_to_completion(
        pat.match_stream(ev, after_match="skip_past_last"), "append")
    ex = (m.select("user_id", "start_id", "end_id",
                   F.explode(F.arrays_zip("ev_ids", "ev_stages"))
                   .alias("z"))
          .select("user_id", "start_id", "end_id",
                  F.col("z.ev_ids").alias("event_id"),
                  F.col("z.ev_stages").alias("stage")))
    clicks = ex.filter(F.col("stage") == 0).join(
        t(spark, sf_dir, "events").select("event_id", "value"), "event_id")
    return (clicks.groupBy("user_id", "start_id", "end_id")
            .agg(F.round(F.sum("value"), 6).alias("click_sum"),
                 F.count("*").alias("n_clicks")))


# --------------------------------------------------------------------------
# SQL PATTERN GROUPS (round 9, EXCEEDS-reference: match_recognize.md:1106
# documents pattern groups as unsupported; the NFA's round-8 group
# quantifiers execute them).  Value classes partition the domain
# (H >= 45, L < 25, M in [25, 45)), so strict contiguity makes the
# group rep count deterministic: after each completed (L M) rep the
# loop-back and proceed branches are distinguished by the very next
# row's class.  AFTER MATCH SKIP TO NEXT ROW emits one preferred match
# per anchor independently — the oracle needs no cross-anchor logic.
# --------------------------------------------------------------------------
_MR_GROUP_EXACT_ORACLE = """
WITH o AS (
  SELECT user_id, event_id,
         CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
              ELSE 'M' END AS cls,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 1) OVER w AS c1,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 2) OVER w AS c2,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 3) OVER w AS c3,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 4) OVER w AS c4,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 5) OVER w AS c5,
         lead(event_id, 5) OVER w AS e5
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(event_id AS BIGINT) AS start_id,
       CAST(e5 AS BIGINT) AS end_id
FROM o
WHERE cls = 'H' AND c1 = 'L' AND c2 = 'M' AND c3 = 'L' AND c4 = 'M'
  AND c5 = 'H'
"""

_SQL_MR_GROUP_EXACT_TEXT = """
SELECT user_id, start_id, end_id
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(H.event_id) AS start_id, LAST(T.event_id) AS end_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (H (L M){2} T)
  DEFINE H AS value >= 45,
         L AS value < 25,
         M AS value >= 25 AND value < 45,
         T AS value >= 45
)
"""


@register("flink_sql_mr_pattern_group_exact", _MR_GROUP_EXACT_ORACLE)
def flink_sql_mr_pattern_group_exact(spark, sf_dir):
    """Exact pattern group ``(L M){2}``: unrolled at compile time (no
    group state), six strictly-adjacent class-typed rows — the
    lead-chain oracle."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_GROUP_EXACT_TEXT,
        batch_df=t(spark, sf_dir, "events"))


_MR_GROUP_OOM_SQL_ORACLE = """
WITH RECURSIVE
o AS (
  SELECT user_id, event_id,
         CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
              ELSE 'M' END AS cls,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
walk(user_id, h_rn, i, k) AS (
  SELECT user_id, rn, rn + 1, 0 FROM o WHERE cls = 'H'
  UNION ALL
  SELECT w.user_id, w.h_rn, w.i + 2, w.k + 1
  FROM walk w
  JOIN o l ON l.user_id = w.user_id AND l.rn = w.i AND l.cls = 'L'
  JOIN o m ON m.user_id = w.user_id AND m.rn = w.i + 1 AND m.cls = 'M')
SELECT w.user_id,
       CAST(h.event_id AS BIGINT) AS start_id,
       CAST(t.event_id AS BIGINT) AS end_id,
       CAST(w.k AS BIGINT) AS n_pairs
FROM walk w
JOIN o h ON h.user_id = w.user_id AND h.rn = w.h_rn
JOIN o t ON t.user_id = w.user_id AND t.rn = w.i AND t.cls = 'H'
WHERE w.k >= 1
"""

_SQL_MR_GROUP_OOM_TEXT = """
SELECT user_id, start_id, end_id, n_pairs
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(H.event_id) AS start_id, LAST(T.event_id) AS end_id,
           COUNT(L.*) AS n_pairs
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (H (L M)+ T)
  DEFINE H AS value >= 45,
         L AS value < 25,
         M AS value >= 25 AND value < 45,
         T AS value >= 45
)
"""


@register("flink_sql_mr_pattern_group_one_or_more", _MR_GROUP_OOM_SQL_ORACLE)
def flink_sql_mr_pattern_group_one_or_more(spark, sf_dir):
    """Unbounded pattern group ``(L M)+`` in SQL text: the NFA group
    loop-back edges with strict seams; the rep count is deterministic
    (the row after a completed rep is either L — continue — or
    H-class — close; the classes partition the value domain).  Oracle:
    recursive pair-chain walk per anchor."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_GROUP_OOM_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# SQL:2016 pattern EXCLUSION `{- B+ -}` (round 9, EXCEEDS-reference:
# match_recognize.md:1115 lists exclusion as unsupported): the excluded
# loop's rows match and feed COUNT(B.*) but are dropped from the ALL
# ROWS output — only the A and C rows of each match surface.
# --------------------------------------------------------------------------
_MR_EXCLUSION_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
m AS (
  SELECT c.user_id, q.rn - c.rn - 1 AS n_b,
         c.event_id AS a_id, q.event_id AS c_id
  FROM (SELECT * FROM o WHERE event_type = 'click') c,
  LATERAL (SELECT rn, event_id, event_type FROM o x
           WHERE x.user_id = c.user_id AND x.rn > c.rn
             AND x.event_type <> 'view'
           ORDER BY x.rn LIMIT 1) q
  WHERE q.event_type = 'purchase' AND q.rn > c.rn + 1)
SELECT user_id, CAST(a_id AS BIGINT) AS event_id,
       'A' AS classifier, CAST(n_b AS BIGINT) AS n_b
FROM m
UNION ALL
SELECT user_id, CAST(c_id AS BIGINT), 'C', CAST(n_b AS BIGINT)
FROM m
"""

_SQL_MR_EXCLUSION_TEXT = """
SELECT user_id, event_id, classifier, n_b
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES COUNT(B.*) AS n_b
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A {- B+ -} C)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'view',
         C AS event_type = 'purchase'
)
"""


@register("flink_sql_mr_exclusion_all_rows", _MR_EXCLUSION_ORACLE)
def flink_sql_mr_exclusion_all_rows(spark, sf_dir):
    """Pattern exclusion in ALL ROWS PER MATCH: click {- view+ -}
    purchase — view rows participate in matching and in COUNT(B.*),
    but only the click and purchase rows are output."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_EXCLUSION_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# SQL:2016 alternation (round 9, EXCEEDS-reference: match_recognize.md
# :1108 lists alternation as unsupported): PATTERN ((A B | C D) T) runs
# as the UNION of the expanded branch patterns — exact because the
# branch heads are disjoint value classes (checked against the input at
# execution) and AFTER MATCH is SKIP TO NEXT ROW.  The oracle is a
# lead-chain with the branch disjunction inline.
# --------------------------------------------------------------------------
_MR_ALTERNATION_ORACLE = """
WITH o AS (
  SELECT user_id, event_id,
         CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
              ELSE 'M' END AS cls,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 1) OVER w AS c1,
         lead(CASE WHEN value >= 45 THEN 'H' WHEN value < 25 THEN 'L'
                   ELSE 'M' END, 2) OVER w AS c2,
         lead(event_id, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(e2 AS BIGINT) AS end_id,
       CAST(CASE WHEN cls = 'L' THEN 1 ELSE 0 END AS BIGINT) AS n_a,
       CAST(CASE WHEN cls = 'M' THEN 1 ELSE 0 END AS BIGINT) AS n_c
FROM o
WHERE ((cls = 'L' AND c1 = 'M') OR (cls = 'M' AND c1 = 'L'))
  AND c2 = 'H'
"""

_SQL_MR_ALTERNATION_TEXT = """
SELECT user_id, end_id, n_a, n_c
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES LAST(T.event_id) AS end_id,
           COUNT(A.*) AS n_a, COUNT(C.*) AS n_c
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN ((A B | C D) T)
  DEFINE A AS value < 25,
         B AS value >= 25 AND value < 45,
         C AS value >= 25 AND value < 45,
         D AS value < 25,
         T AS value >= 45
)
"""


@register("flink_sql_mr_alternation", _MR_ALTERNATION_ORACLE)
def flink_sql_mr_alternation(spark, sf_dir):
    """Alternation branch union: low-then-mid (A B) or mid-then-low
    (C D) followed by a high row — measures over the other branch's
    variables yield 0, and head disjointness is verified against the
    input before execution."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_ALTERNATION_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# PERMUTE (round 9, EXCEEDS-reference: match_recognize.md:1111 lists
# PERMUTE as unsupported): PATTERN (PERMUTE (A, B, C)) rewrites to the
# alternation of all 6 orderings; the branch-union divergence checks
# then require the three classes pairwise disjoint (they partition the
# value domain here).  Oracle: any 3 consecutive rows covering all
# three classes.
# --------------------------------------------------------------------------
_MR_PERMUTE_ORACLE = """
WITH o AS (
  SELECT user_id, event_id,
         CASE WHEN value >= 45 THEN 'C' WHEN value < 25 THEN 'A'
              ELSE 'B' END AS cls,
         lead(CASE WHEN value >= 45 THEN 'C' WHEN value < 25 THEN 'A'
                   ELSE 'B' END, 1) OVER w AS c1,
         lead(CASE WHEN value >= 45 THEN 'C' WHEN value < 25 THEN 'A'
                   ELSE 'B' END, 2) OVER w AS c2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(event_id AS BIGINT) AS first_id
FROM o
WHERE c1 IS NOT NULL AND c2 IS NOT NULL
  AND cls <> c1 AND cls <> c2 AND c1 <> c2
"""

_SQL_MR_PERMUTE_TEXT = """
SELECT user_id, first_id
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES MIN(S.event_id) AS first_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (PERMUTE (A, B, C))
  SUBSET S = (A, B, C)
  DEFINE A AS value < 25,
         B AS value >= 25 AND value < 45,
         C AS value >= 45
)
"""


@register("flink_sql_mr_permute", _MR_PERMUTE_ORACLE)
def flink_sql_mr_permute(spark, sf_dir):
    """PERMUTE (A, B, C): three consecutive rows covering all three
    value classes in any order — 6-branch alternation union with
    runtime-verified pairwise disjointness."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_PERMUTE_TEXT,
        batch_df=t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# ANCHOR $ (round 9, EXCEEDS-reference: match_recognize.md:1113 refuses
# anchors as streaming-meaningless — a bounded replay has a well-defined
# partition end): click immediately followed by purchase, where the
# purchase is the partition's FINAL event.  Oracle: the last two rows
# per user by (ts, event_id).
# --------------------------------------------------------------------------
_MR_ANCHOR_END_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events)
SELECT a.user_id, CAST(a.event_id AS BIGINT) AS a_id,
       CAST(b.event_id AS BIGINT) AS b_id
FROM (SELECT * FROM o WHERE rd = 2) a
JOIN (SELECT * FROM o WHERE rd = 1) b USING (user_id)
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""

_SQL_MR_ANCHOR_END_TEXT = """
SELECT user_id, a_id, b_id
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts
  MEASURES FIRST(A.event_id) AS a_id, LAST(B.event_id) AS b_id
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B $)
  DEFINE A AS event_type = 'click',
         B AS event_type = 'purchase'
)
"""


@register("flink_sql_mr_anchor_end", _MR_ANCHOR_END_ORACLE)
def flink_sql_mr_anchor_end(spark, sf_dir):
    """$ anchor on a bounded replay: the click->purchase adjacency that
    CLOSES each user's partition (match end == the partition's last
    event, enforced as a broadcast-joined bounds filter on the match
    log before the measures projection)."""
    from flink_release_1_10_0_spark.queries.helpers import t
    from flink_release_1_10_0_spark.sql_match import (
        execute_match_recognize_sql)

    return execute_match_recognize_sql(
        spark, _SQL_MR_ANCHOR_END_TEXT,
        batch_df=t(spark, sf_dir, "events"))
