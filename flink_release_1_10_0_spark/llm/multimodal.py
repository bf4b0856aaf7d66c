"""Multimodal column plumbing: opaque binary payloads with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image``/``decode_audio`` raise NotImplementedError); everything
around it — the binary column representation, Arrow-batched
``mapInPandas`` transforms, metadata schemas, deterministic fake features
for testing — is real and exercised.

Scale note: payload bytes travel in Arrow record batches;
``mapInPandas`` processes a partition per task with zero driver
involvement, which is the correct plumbing for TB-scale blob columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = ("doc_id bigint, byte_len bigint, digest string, "
               "fake_width int, fake_height int")


def decode_image(payload: bytes):
    """Real image decode — requires a codec library not present in this
    environment.  The pipeline shape (binary in, features out) is tested
    through ``extract_fake_metadata`` instead."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio codec not available in this environment")


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the text,
    standing in for image/audio bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def extract_fake_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column: byte
    length, md5 digest, and deterministic fake decode dimensions (what a
    real decoder would emit as width/height)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            digests = [hashlib.md5(p).hexdigest() for p in payloads]
            h = [int(d[:15], 16) for d in digests]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int64"),
                "digest": digests,
                "fake_width": [x % 1920 for x in h],
                "fake_height": [x % 1080 for x in h],
            })

    # guide §2.5/§4: the Python-boundary pass is the hot loop; a
    # 1-split scan serializes every worker (identity at scale).  The
    # select ships ONLY the two columns the function reads (§4.1).
    from flink_release_1_10_0_spark.llm.text import (
        ensure_min_parallelism)
    return (ensure_min_parallelism(df.select("doc_id", "payload"))
              .mapInPandas(extract, schema=META_SCHEMA))


FRAME_SCHEMA = ("doc_id bigint, frame_idx bigint, frame_ts_ms bigint, "
                "frame_digest string")


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 fps: int = 30) -> DataFrame:
    """Video frame sampling plumbing: one binary payload -> N frame rows
    (every ``every_ms`` milliseconds).  The decode is a deterministic
    fake (frame count derived from payload length, digests from
    payload+index); a real build swaps ``_fake_frames`` for a codec call.
    The Spark-side shape — mapInPandas fan-out, typed frame rows,
    partition-local work — is the real thing.
    """

    def _fake_frames(payload: bytes, doc_id: int):
        # pretend 1 byte ≈ 1 ms of video, capped for test data
        duration_ms = min(len(payload), 10_000)
        for i, ts in enumerate(range(0, duration_ms, every_ms)):
            digest = hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
            yield (doc_id, i, ts, digest)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.extend(_fake_frames(payload, int(doc_id)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_digest"])

    # same §2.5/§4 shape as extract_fake_metadata above
    from flink_release_1_10_0_spark.llm.text import (
        ensure_min_parallelism)
    return (ensure_min_parallelism(df.select("doc_id", "payload"))
            .mapInPandas(sample, schema=FRAME_SCHEMA))


RESIZE_SCHEMA = ("doc_id bigint, width int, height int, "
                 "resized_width int, resized_height int, scale double")


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize plumbing: compute target dimensions preserving aspect
    ratio (the arithmetic a resize kernel needs), over the fake decoded
    width/height.  Runs as a pure column expression — JVM-side, no
    Python — because the *plan* step needs no pixel access."""
    meta = extract_fake_metadata(df)
    w, h = F.col("fake_width") + 1, F.col("fake_height") + 1  # avoid 0
    scale = F.round(F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0)), 6)
    return meta.select(
        "doc_id",
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.floor(w * scale).cast("int").alias("resized_width"),
        F.floor(h * scale).cast("int").alias("resized_height"),
        scale.alias("scale"))
