"""Async I/O enrichment — the reference's AsyncWaitOperator pattern
(``flink-streaming-java/.../api/operators/async/AsyncWaitOperator.java:76``,
API ``AsyncDataStream.java``), re-expressed Spark-first.

The reference hides external-lookup latency by keeping up to ``capacity``
requests in flight per task and (in ORDERED mode) re-emitting results in
arrival order.  The Spark-native equivalent: ``mapInPandas`` receives
Arrow batches; inside each batch we fan out the async requests with
``asyncio.gather`` (bounded by a semaphore = the reference's capacity)
and return rows in input order — ordered-mode semantics, zero shuffle,
and the event loop lives entirely inside one Python worker per
partition.  At 100 TB this scales with partitions: each of the 1000
executors runs its own loop; capacity bounds per-task in-flight load on
the external service exactly like the reference's queue.

The external service here is an injectable async callable; tests use a
deterministic pure function (the plumbing — batching, bounded
concurrency, order restoration — is the operator).
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def _native_keys(series: pd.Series) -> list:
    """Lookup keys as native Python values.  Integer dtypes map to plain
    ``int`` (numpy scalars would surprise user-supplied services);
    strings/objects pass through untouched.  Float keys are refused
    loudly — truncating them to int would silently look up the wrong
    key, and a float-keyed external store is almost certainly a schema
    mistake on the caller's side."""
    if pd.api.types.is_integer_dtype(series):
        return [int(k) for k in series]
    if pd.api.types.is_float_dtype(series):
        raise TypeError(
            f"async lookup key column {series.name!r} has float dtype "
            f"{series.dtype}: cast it to an integer or string key first")
    return series.tolist()


def async_enrich(df: DataFrame, key_col: str, out_col: str,
                 service: Callable[[int], Awaitable[str]],
                 capacity: int = 100) -> DataFrame:
    """Ordered async enrichment: adds ``out_col`` = await service(key)
    for every row, preserving row order within each partition."""
    # fresh StructType — StructType.add mutates the receiver, and
    # df.schema is the DataFrame's cached instance
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def lookup_all(keys: list[int]) -> list[str]:
            sem = asyncio.Semaphore(capacity)

            async def one(k: int) -> str:
                async with sem:
                    return await service(k)

            # gather preserves input order regardless of completion order
            return list(await asyncio.gather(*(one(k) for k in keys)))

        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf[out_col] = asyncio.run(lookup_all(_native_keys(pdf[key_col])))
            else:
                pdf[out_col] = pd.Series(dtype=object)
            yield pdf

    return df.mapInPandas(run, out_schema)


def async_enrich_unordered(df: DataFrame, key_col: str, out_col: str,
                           service: Callable[[int], Awaitable[str]],
                           capacity: int = 100,
                           timeout_s: float | None = None,
                           on_timeout: str | None = None) -> DataFrame:
    """``AsyncDataStream.unorderedWait`` analog
    (``AsyncDataStream.java`` / ``AsyncWaitOperator.java:76`` UNORDERED
    mode): results are appended in COMPLETION order, so a slow
    head-of-line request never delays faster ones.  In Spark a
    DataFrame carries no intra-partition order semantics, so unordered
    mode differs from :func:`async_enrich` only in batch latency — the
    result SET is identical, which is exactly the reference's
    ordered/unordered contract.

    ``timeout_s`` reproduces the reference's async-wait timeout: a
    request exceeding it resolves to ``on_timeout`` (the
    ``AsyncFunction.timeout`` override returning a fallback) instead of
    failing the job."""
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def lookup_all(keys: list[int]) -> list[tuple[int, str]]:
            sem = asyncio.Semaphore(capacity)

            async def one(i: int, k: int) -> tuple[int, str]:
                async with sem:
                    if timeout_s is None:
                        return i, await service(k)
                    try:
                        return i, await asyncio.wait_for(service(k),
                                                         timeout_s)
                    except asyncio.TimeoutError:
                        return i, on_timeout

            done: list[tuple[int, str]] = []
            for fut in asyncio.as_completed(
                    [one(i, k) for i, k in enumerate(keys)]):
                done.append(await fut)
            return done

        for pdf in batches:
            if len(pdf):
                order_vals = asyncio.run(
                    lookup_all(_native_keys(pdf[key_col])))
                idx = [i for i, _ in order_vals]
                pdf = pdf.iloc[idx].copy()
                pdf[out_col] = [v for _, v in order_vals]
            else:
                pdf = pdf.copy()
                pdf[out_col] = pd.Series(dtype=object)
            yield pdf

    return df.mapInPandas(run, out_schema)


def async_table_enrich(df: DataFrame, key_col: str,
                       service, out_fields,
                       capacity: int = 100) -> DataFrame:
    """AsyncTableFunction analog (``flink-table-common/.../functions/
    AsyncTableFunction.java``, used by lookup joins via
    ``LookupTableSource`` async runners): per input row, an ASYNC fetch
    returns a TABLE (zero or more rows) which is laterally joined to
    the input row — inner semantics, rows with no matches drop out.

    ``service(key) -> awaitable -> list[tuple]`` with one tuple per
    ``out_fields`` row; ``out_fields`` is ``[(name, DataType), ...]``.
    Concurrency per task is bounded by ``capacity`` (the reference's
    in-flight queue), results are re-emitted in input-row order
    (ORDERED mode).  Same scale shape as ``async_enrich``: one event
    loop per partition, no shuffle, executor-side connections only.
    """
    import numpy as np

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(n, t) for n, t in out_fields])
    out_names = [n for n, _ in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def lookup_all(keys):
            sem = asyncio.Semaphore(capacity)

            async def one(k):
                async with sem:
                    return await service(k)

            return list(await asyncio.gather(*(one(k) for k in keys)))

        for pdf in batches:
            if not len(pdf):
                continue
            results = asyncio.run(
                lookup_all(_native_keys(pdf[key_col])))
            counts = [len(rs) for rs in results]
            idx = np.repeat(np.arange(len(pdf)), counts)
            left = pdf.iloc[idx].reset_index(drop=True)
            right = pd.DataFrame(
                [r for rs in results for r in rs], columns=out_names)
            yield pd.concat([left, right], axis=1)

    return df.mapInPandas(run, out_schema)
