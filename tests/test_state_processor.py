"""State Processor API artifact mechanics (streaming/state_processor.py):
keyed/list/union/broadcast roundtrips, key-group layout + pruned range
reads, removeOperator, format-version refusal, and offline rescale."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.streaming.state_processor import (
    KEY_GROUP_COL, create_savepoint, load_savepoint, merge_keyed_partials,
    rescale_savepoint)
from tests.conftest import compare_query


@pytest.mark.parametrize("name", [
    "state_processor_read_keyed",
    "state_processor_bootstrap_resume",
    "state_processor_rescale_roundtrip",
])
def test_state_processor_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def _keyed(spark):
    return spark.createDataFrame(
        [(i, i * 10) for i in range(40)], "k bigint, total bigint")


def test_keyed_roundtrip_and_key_group_layout(spark):
    path = tempfile.mkdtemp(prefix="sp_test_")
    (create_savepoint(spark, max_parallelism=8)
     .with_keyed_operator("agg", _keyed(spark), ["k"]).write(path))
    # artifact is partitioned by key group (KeyGroupRangeInputSplit layout)
    groups = sorted(d for d in os.listdir(os.path.join(path, "op_agg"))
                    if d.startswith(f"{KEY_GROUP_COL}="))
    assert groups and all(
        0 <= int(g.split("=")[1]) < 8 for g in groups)
    back = load_savepoint(spark, path).read_keyed_state("agg")
    assert {(r.k, r.total) for r in back.collect()} \
        == {(i, i * 10) for i in range(40)}


def test_keyed_range_read_prunes_partitions(spark):
    path = tempfile.mkdtemp(prefix="sp_test_")
    (create_savepoint(spark, max_parallelism=8)
     .with_keyed_operator("agg", _keyed(spark), ["k"]).write(path))
    sp = load_savepoint(spark, path)
    lo_hi = sp.read_keyed_state("agg", key_groups=(0, 3))
    rest = sp.read_keyed_state("agg", key_groups=(4, 7))
    full = sp.read_keyed_state("agg")
    assert lo_hi.count() + rest.count() == full.count() == 40
    # the range filter reaches the scan as a partition filter
    plan = lo_hi._jdf.queryExecution().executedPlan().toString()
    assert KEY_GROUP_COL in plan


def test_list_union_broadcast_state(spark):
    path = tempfile.mkdtemp(prefix="sp_test_")
    lst = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    bc = spark.createDataFrame([("cfg", "7")], "key string, val string")
    (create_savepoint(spark, 4)
     .with_list_operator("lst", lst)
     .with_list_operator("uni", lst, kind="union")
     .with_list_operator("bc", bc, kind="broadcast")
     .write(path))
    sp = load_savepoint(spark, path)
    assert {r.v for r in sp.read_list_state("lst").collect()} == {1, 2, 3}
    assert {r.v for r in sp.read_union_state("uni").collect()} == {1, 2, 3}
    assert sp.read_broadcast_state("bc").collect()[0].val == "7"
    with pytest.raises(TypeError):
        sp.read_keyed_state("lst")
    with pytest.raises(TypeError):
        sp.read_broadcast_state("lst")
    with pytest.raises(KeyError):
        sp.read_list_state("nope")


def test_remove_operator_copy_on_write(spark):
    src = tempfile.mkdtemp(prefix="sp_test_")
    dest = tempfile.mkdtemp(prefix="sp_test_new_")
    (create_savepoint(spark, 4)
     .with_keyed_operator("a", _keyed(spark), ["k"])
     .with_list_operator("b", spark.createDataFrame([(1,)], "v int"))
     .write(src))
    load_savepoint(spark, src).remove_operator("b").write(dest)
    meta = json.load(open(os.path.join(dest, "_savepoint_metadata.json")))
    assert set(meta["operators"]) == {"a"}
    # source untouched
    assert set(load_savepoint(spark, src).meta["operators"]) == {"a", "b"}


def test_format_version_refusal(spark):
    path = tempfile.mkdtemp(prefix="sp_test_")
    (create_savepoint(spark, 4)
     .with_list_operator("x", spark.createDataFrame([(1,)], "v int"))
     .write(path))
    meta_path = os.path.join(path, "_savepoint_metadata.json")
    meta = json.load(open(meta_path))
    meta["format_version"] = 999
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="format version"):
        load_savepoint(spark, path)


def test_rescale_preserves_state_and_reassigns_groups(spark):
    src = tempfile.mkdtemp(prefix="sp_test_")
    dest = tempfile.mkdtemp(prefix="sp_test_rs_")
    (create_savepoint(spark, max_parallelism=128)
     .with_keyed_operator("agg", _keyed(spark), ["k"]).write(src))
    rescale_savepoint(spark, src, dest, new_max_parallelism=4)
    sp = load_savepoint(spark, dest)
    assert sp.max_parallelism == 4
    groups = {int(d.split("=")[1])
              for d in os.listdir(os.path.join(dest, "op_agg"))
              if d.startswith(f"{KEY_GROUP_COL}=")}
    assert groups <= {0, 1, 2, 3}
    back = sp.read_keyed_state("agg")
    assert {(r.k, r.total) for r in back.collect()} \
        == {(i, i * 10) for i in range(40)}


def test_rescale_in_place_refuses(spark):
    """rescale_savepoint(src, src) would let the lazily-read staged
    frames race the overwrite delete (write()'s copy-on-write guard
    can't see it: the staging NewSavepoint has path=None) — refuse, and
    leave the source artifact intact."""
    src = tempfile.mkdtemp(prefix="sp_test_rsip_")
    (create_savepoint(spark, max_parallelism=128)
     .with_keyed_operator("agg", _keyed(spark), ["k"]).write(src))
    with pytest.raises(ValueError, match="dest != src"):
        rescale_savepoint(spark, src, src, new_max_parallelism=4)
    # source untouched and still readable
    assert load_savepoint(spark, src).read_keyed_state("agg").count() == 40


def test_merge_keyed_partials_is_exact(spark):
    a = spark.createDataFrame([(1, 2, 10), (2, 1, 5)],
                              "k bigint, n bigint, s bigint")
    b = spark.createDataFrame([(1, 3, 7), (3, 1, 1)],
                              "k bigint, n bigint, s bigint")
    out = merge_keyed_partials(a, b, ["k"], ["n", "s"])
    assert {(r.k, r.n, r.s) for r in out.collect()} \
        == {(1, 5, 17), (2, 1, 5), (3, 1, 1)}


def test_bootstrap_requires_key_column(spark):
    with pytest.raises(ValueError, match="key column"):
        create_savepoint(spark, 4).with_keyed_operator(
            "a", _keyed(spark), ["missing"])


def test_in_place_rewrite_of_read_operator_refuses(spark):
    src = tempfile.mkdtemp(prefix="sp_test_cow_")
    (create_savepoint(spark, 4)
     .with_keyed_operator("agg", _keyed(spark), ["k"]).write(src))
    sp = load_savepoint(spark, src)
    sp.with_keyed_operator("agg", sp.read_keyed_state("agg"), ["k"])
    with pytest.raises(ValueError, match="copy-on-write"):
        sp.write()                       # same path -> refuse
    dest = tempfile.mkdtemp(prefix="sp_test_cow_new_")
    sp.write(dest)                       # new path -> fine
    assert load_savepoint(spark, dest).read_keyed_state("agg").count() == 40
