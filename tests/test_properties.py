"""Property-based tests (hypothesis) for custom operators — randomized
inputs, invariant assertions.  The reference has no property testing
(SURVEY.md §5.6); these guard the operators WE wrote on top of Spark,
where a Catalyst built-in can't vouch for correctness.

Spark jobs are slow per example, so examples are few and data is small;
the value is shrinkage to minimal counterexamples on failure.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # key
        st.integers(min_value=0, max_value=10_000),     # id (deduped below)
        st.integers(min_value=-100, max_value=100),     # value
    ),
    min_size=1, max_size=30,
)

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_split_distinct_agg_equals_count_distinct(spark, rows):
    from flink_release_1_10_0_spark.operators.skew import split_distinct_agg

    df = spark.createDataFrame(
        [(k, i, float(v)) for k, i, v in rows], "k int, id int, v double")
    from pyspark.sql import functions as F

    split = {(r["k"], r["n_distinct"])
             for r in split_distinct_agg(df, ["k"], "id", n_buckets=4).collect()}
    direct = {(r["k"], r["n"]) for r in
              df.groupBy("k").agg(F.countDistinct("id").alias("n")).collect()}
    assert split == direct


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, rows):
    from flink_release_1_10_0_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, i) for k, i, _ in rows], "k int, lid int")
    right = spark.createDataFrame(
        [(k, v) for k, _, v in rows], "k int, rv int")
    plain = left.join(right, "k").count()
    salted = salted_join(left, right, "k", n_salts=3).count()
    assert plain == salted


@given(rows=ROWS, n=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_top_n_invariants(spark, rows, n):
    """top_n returns <= n rows per key, ranked 1..m, and every returned
    value is >= any non-returned value of the same key."""
    from collections import defaultdict

    from flink_release_1_10_0_spark.operators.ranking import top_n

    uniq = {(k, i): v for k, i, v in rows}
    data = [(k, i, float(v)) for (k, i), v in uniq.items()]
    df = spark.createDataFrame(data, "k int, id int, v double")
    from pyspark.sql import functions as F

    out = top_n(df, ["k"], order_by=[F.col("v").desc(), F.col("id").asc()],
                n=n).collect()
    by_key = defaultdict(list)
    for r in out:
        by_key[r["k"]].append(r)
    values = defaultdict(list)
    for k, i, v in data:
        values[k].append(v)
    for k, group in by_key.items():
        assert len(group) <= n
        assert sorted(r["rn"] for r in group) == list(range(1, len(group) + 1))
        kept_min = min(r["v"] for r in group)
        dropped = sorted(values[k], reverse=True)[len(group):]
        assert all(kept_min >= d for d in dropped)


def test_no_iterrows_in_package():
    """Guard: pandas.iterrows is banned in the package — stateful hot
    loops must extract columns once per Arrow batch (tolist) and walk
    plain lists (r2 verdict #4: iterrows is 10-100x slower row boxing)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "flink_release_1_10_0_spark"
    offenders = [str(p) for p in root.rglob("*.py")
                 if re.search(r"\.iterrows\(", p.read_text())]
    assert offenders == []


def test_no_driver_side_collect_in_package():
    """Guard: no .collect()/.toPandas()/driver-side loops inside the
    engine package — every operator must stay distributed (the bench
    and correctness harnesses collect, the package never does).  The
    one sanctioned exception would need an explicit allowlist entry."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "flink_release_1_10_0_spark"
    pat = re.compile(r"\.collect\(\)|\.toPandas\(\)|\.toLocalIterator\(")
    offenders = [str(p) for p in root.rglob("*.py")
                 if pat.search(p.read_text())]
    assert offenders == []
