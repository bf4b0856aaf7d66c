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

    return (df.select("doc_id", "payload")
              .mapInPandas(extract, schema=META_SCHEMA))
