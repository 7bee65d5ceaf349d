"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at corpus scale: the payload is a
``binary`` column (or a pointer to object storage), metadata is typed
columns, and per-item decode/feature-extract runs as Arrow-batched
``mapInPandas`` — the ONLY sanctioned Python hot path in this engine.

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError; the shipped
feature extractor computes deterministic byte-level features (length,
md5, first-bytes) so the Spark-side plumbing — schema, batching,
partitioning — is real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("payload_md5", StringType()),
        StructField("head_hex", StringType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real decode needs PIL/libjpeg, absent in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment"
    )


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo payload: UTF-8 bytes of the text column standing in for an
    opaque media blob (keeps the pipeline runnable on the synthetic
    corpus)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas (not a row UDF): each Arrow batch arrives as a
    pandas DataFrame; output schema is fixed.  At 100 TB parallelism
    comes from input splits; a small single-file input is repartitioned
    so every core gets a Python worker instead of one worker taking the
    whole table."""
    sc = media.sparkSession.sparkContext
    # cap at 16: beyond that, per-worker Python spawn cost outweighs
    # the extra parallelism for typical per-file row counts
    n = parallelism or min(sc.defaultParallelism, 16)
    if media.rdd.getNumPartitions() < n:
        media = media.repartition(n)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling STUB: emits the (media_id, frame_no) plan a
    real decoder would fill; payload decode is NotImplemented."""
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_no"),
    )
