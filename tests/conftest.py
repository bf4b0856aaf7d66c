from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_release_1_10_0_spark.catalog import TABLES
from flink_release_1_10_0_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    yield con


def compare_query(spark, duck, name: str, sf_dir: str = SF_DIR):
    """Assert a registered query matches its oracle (driver-style compare)."""
    import math

    from flink_release_1_10_0_spark.queries import all_oracles, all_queries

    def _norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.10g}"
        return str(v)

    sdf = all_queries()[name](spark, sf_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    oracle = all_oracles().get(name)
    if oracle is None:
        assert len(srows) >= 0
        return srows
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols), f"{name}: cols {scols} != {dcols}"
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sk = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    dk = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    assert sk == dk, f"{name}: values differ; first diff {next((a, b) for a, b in zip(sk, dk) if a != b)}"
    return srows
