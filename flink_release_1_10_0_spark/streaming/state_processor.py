"""State Processor API analog: read, transform, and bootstrap savepoints
of keyed/operator state as batch DataFrames.

Reference (``flink-libraries/flink-state-processing-api/src/main/java/org/
apache/flink/state/api/``):

- ``Savepoint.java`` — ``Savepoint.load(env, path, backend)`` /
  ``Savepoint.create(backend, maxParallelism)``;
- ``ExistingSavepoint.java`` — ``readKeyedState(uid, readerFn)``,
  ``readListState``, ``readUnionState``, ``readBroadcastState``;
- ``OperatorTransformation.java`` + ``BootstrapTransformation.java`` —
  ``bootstrapWith(dataset).keyBy(key).transform(bootstrapFn)``;
- ``WritableSavepoint.java`` — ``withOperator(uid, transformation)``,
  ``removeOperator(uid)``, ``write(path)``;
- ``input/KeyedStateInputFormat.java`` + ``input/splits/
  KeyGroupRangeInputSplit.java`` — keyed state is read split-parallel by
  KEY GROUP; ``flink-runtime/.../state/KeyGroupRangeAssignment.java:72``
  assigns ``murmurHash(key.hashCode()) % maxParallelism``.

Spark-first shape: a savepoint is a directory of per-operator parquet
datasets plus a JSON metadata file.  Keyed state is written PARTITIONED BY
its key group — ``pmod(hash(key columns), max_parallelism)``, Spark's
``hash`` being the same Murmur3 family the reference assigns key groups
with — so a 1000-executor reader gets partition-pruned, split-parallel
scans per key-group range exactly like ``KeyGroupRangeInputSplit``;
rescaling to a different ``max_parallelism`` is a metadata-level rewrite
(one shuffle on the new assignment), not a reshuffle of reader code.
Reads are plain ``spark.read.parquet`` — Catalyst prunes key-group
directories when a reader filters on ``__key_group``.

Unkeyed operator state (list/union/broadcast, ``OperatorStateInputFormat``)
is a flat parquet dataset: list state returns each element once
(round-robin redistribution on restore is the runtime's concern, not the
artifact's), union and broadcast state return the single logical copy every
subtask would receive.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SAVEPOINT_FORMAT_VERSION = 1
_META_FILE = "_savepoint_metadata.json"
KEY_GROUP_COL = "__key_group"

_KINDS = ("keyed", "list", "union", "broadcast")


def _key_group(key_cols: list[str], max_parallelism: int):
    # KeyGroupRangeAssignment.java:72 — murmur(key hash) % maxParallelism
    return F.pmod(F.hash(*key_cols), F.lit(max_parallelism))


class _SavepointBase:
    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        # uid -> (df, kind, key_cols)  staged but not yet written
        self._staged: dict[str, tuple[DataFrame, str, list[str]]] = {}
        self._removed: set[str] = set()

    @property
    def max_parallelism(self) -> int:
        return self.meta["max_parallelism"]

    # -- OperatorTransformation.bootstrapWith(...).keyBy(...).transform --
    def with_keyed_operator(self, uid: str, df: DataFrame,
                            key_cols: list[str]) -> "_SavepointBase":
        for c in key_cols:
            if c not in df.columns:
                raise ValueError(f"key column {c!r} not in state columns "
                                 f"{df.columns}")
        self._staged[uid] = (df, "keyed", key_cols)
        return self

    def with_list_operator(self, uid: str, df: DataFrame,
                           kind: str = "list") -> "_SavepointBase":
        if kind not in ("list", "union", "broadcast"):
            raise ValueError(f"unkeyed state kind must be list/union/"
                             f"broadcast, got {kind!r}")
        self._staged[uid] = (df, kind, [])
        return self

    def remove_operator(self, uid: str) -> "_SavepointBase":
        """WritableSavepoint.removeOperator — drop an operator's state
        from the written artifact."""
        self._removed.add(uid)
        self._staged.pop(uid, None)
        return self

    def write(self, path: str | None = None) -> str:
        """Write the savepoint artifact (WritableSavepoint.write).

        Existing operators not staged/removed are carried over untouched
        (the reference copies their state handles into the new metadata).
        """
        dest = path or self.path
        if dest is None:
            raise ValueError("NewSavepoint.write requires a path")
        for uid in self._staged:
            if (self.path is not None
                    and os.path.abspath(dest) == os.path.abspath(self.path)
                    and uid in self.meta.get("operators", {})):
                # Spark's overwrite deletes the target before the staged
                # frame (lazily reading from it) is computed — refuse the
                # in-place rewrite instead of failing mid-write (the
                # reference's WritableSavepoint also writes NEW paths)
                raise ValueError(
                    f"operator {uid!r} is staged over its own source "
                    "savepoint; write(new_path) copy-on-write instead")
        os.makedirs(dest, exist_ok=True)
        operators = {}
        for uid, spec in self.meta.get("operators", {}).items():
            if uid in self._removed or uid in self._staged:
                continue
            if os.path.abspath(dest) != os.path.abspath(self.path):
                shutil.copytree(os.path.join(self.path, f"op_{uid}"),
                                os.path.join(dest, f"op_{uid}"))
            operators[uid] = spec
        for uid, (df, kind, key_cols) in self._staged.items():
            op_dir = os.path.join(dest, f"op_{uid}")
            if kind == "keyed":
                (df.withColumn(KEY_GROUP_COL,
                               _key_group(key_cols, self.max_parallelism))
                 .repartition(KEY_GROUP_COL)
                 .write.mode("overwrite")
                 .partitionBy(KEY_GROUP_COL).parquet(op_dir))
            else:
                df.write.mode("overwrite").parquet(op_dir)
            operators[uid] = {"kind": kind, "key_cols": key_cols}
        meta = {"format_version": SAVEPOINT_FORMAT_VERSION,
                "max_parallelism": self.max_parallelism,
                "operators": operators}
        with open(os.path.join(dest, _META_FILE), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        return dest


class NewSavepoint(_SavepointBase):
    """Savepoint.create(backend, maxParallelism) analog."""


class ExistingSavepoint(_SavepointBase):
    """Savepoint.load(env, path) analog: batch reads over the artifact,
    copy-on-write modification via with_*/remove + write(new_path)."""

    def _op(self, uid: str, want_kinds: tuple[str, ...]) -> dict:
        ops = self.meta["operators"]
        if uid not in ops:
            raise KeyError(f"savepoint has no operator uid {uid!r}; "
                           f"present: {sorted(ops)}")
        spec = ops[uid]
        if spec["kind"] not in want_kinds:
            raise TypeError(f"operator {uid!r} holds {spec['kind']} state, "
                            f"not {'/'.join(want_kinds)}")
        return spec

    def read_keyed_state(self, uid: str,
                         key_groups: tuple[int, int] | None = None
                         ) -> DataFrame:
        """ExistingSavepoint.readKeyedState: the operator's keyed state as
        a DataFrame.  ``key_groups=(lo, hi)`` reads only that key-group
        range (KeyGroupRangeInputSplit) — partition-pruned, not scanned."""
        self._op(uid, ("keyed",))
        df = self.spark.read.parquet(os.path.join(self.path, f"op_{uid}"))
        if key_groups is not None:
            lo, hi = key_groups
            df = df.filter((F.col(KEY_GROUP_COL) >= lo)
                           & (F.col(KEY_GROUP_COL) <= hi))
        return df.drop(KEY_GROUP_COL)

    def read_list_state(self, uid: str) -> DataFrame:
        self._op(uid, ("list", "union"))
        return self.spark.read.parquet(os.path.join(self.path, f"op_{uid}"))

    read_union_state = read_list_state

    def read_broadcast_state(self, uid: str) -> DataFrame:
        self._op(uid, ("broadcast",))
        return self.spark.read.parquet(os.path.join(self.path, f"op_{uid}"))


def create_savepoint(spark: SparkSession, max_parallelism: int = 128
                     ) -> NewSavepoint:
    if max_parallelism < 1:
        raise ValueError("max_parallelism must be >= 1")
    return NewSavepoint(spark, path=None,
                        meta={"max_parallelism": max_parallelism,
                              "operators": {}})


def load_savepoint(spark: SparkSession, path: str) -> ExistingSavepoint:
    meta_path = os.path.join(path, _META_FILE)
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format_version") != SAVEPOINT_FORMAT_VERSION:
        raise ValueError(
            f"savepoint format version {meta.get('format_version')} != "
            f"{SAVEPOINT_FORMAT_VERSION}; rewrite the artifact with this "
            "library version (the reference refuses cross-version "
            "savepoints the same way)")
    return ExistingSavepoint(spark, path, meta)


def rescale_savepoint(spark: SparkSession, src: str, dest: str,
                      new_max_parallelism: int) -> str:
    """Rewrite a savepoint under a different max parallelism: every keyed
    operator's rows are reassigned to ``murmur(key) % new_max`` groups —
    the batch analog of restoring a savepoint at a different
    maxParallelism, which the reference forbids at runtime but the State
    Processor API enables offline."""
    if os.path.realpath(src) == os.path.realpath(dest):
        # the staged frames read LAZILY from src; overwrite would delete
        # each op_<uid> directory mid-job.  write()'s own copy-on-write
        # guard can't see this (the staging NewSavepoint has path=None),
        # so refuse here — same contract as write(new_path).  realpath,
        # not abspath: a symlink alias of src is the same physical
        # artifact and must refuse too.
        raise ValueError(
            "rescale_savepoint requires dest != src: the rescaled state "
            "is read lazily from the source artifact, so an in-place "
            "overwrite destroys it mid-write; rescale to a new path")
    sp = load_savepoint(spark, src)
    out = create_savepoint(spark, new_max_parallelism)
    for uid, spec in sp.meta["operators"].items():
        if spec["kind"] == "keyed":
            out.with_keyed_operator(uid, sp.read_keyed_state(uid),
                                    spec["key_cols"])
        else:
            out.with_list_operator(uid, sp.read_list_state(uid),
                                   spec["kind"])
    return out.write(dest)


def merge_keyed_partials(savepoint_state: DataFrame, new_state: DataFrame,
                         key_cols: list[str],
                         sum_cols: list[str]) -> DataFrame:
    """Resume-from-bootstrap merge: combine a savepoint's keyed partial
    aggregates with partials computed over post-savepoint data.  Additive
    state only (counts/sums — what KeyedStateBootstrapFunction seeds in
    the reference's own examples); one shuffle on the key."""
    return (savepoint_state.select(*key_cols, *sum_cols)
            .unionByName(new_state.select(*key_cols, *sum_cols))
            .groupBy(*key_cols)
            .agg(*[F.sum(c).alias(c) for c in sum_cols]))
