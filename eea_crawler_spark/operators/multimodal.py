"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the same envelope discipline the reference uses
for its opaque ``raw_value`` blob (``dags/variables.json:2577-2580``).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through Python
row objects.

The actual media decoding libraries are not available in this
environment, so ``decode_media`` is STUBBED: the deterministic fake
derives features with hashlib (md5) so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and oracle-checkable,
while ``real_decode_stub`` marks where a PIL/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
    ]
)


def real_decode_stub(content: bytes, mime: str):
    """Where PIL/librosa/ffmpeg decode would run; libs absent here."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg, not present in this environment"
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": content.map(len).astype("int32"),
                # deterministic fake feature — md5 matches the SQL oracle
                "feature": content.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": content.map(lambda b: len(b) % 640).astype("int32"),
            }
        )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage over (media_id, content, meta) rows.

    Narrow transform: runs wherever the binary partition lives, no
    shuffle; at scale, repartition upstream by size so batches stay
    under the Arrow batch memory budget.
    """
    return media.select("media_id", "content").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as a binary payload so
    the multimodal plumbing is exercised against driver testdata."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.col("source").alias("source")
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing demo: slice the payload at fixed strides.

    Stands in for video frame extraction — shows the (binary → array of
    binary chunks) shape with built-in functions only.
    """
    n_frames = F.floor(F.length("content") / every_n_bytes).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: F.substring(F.col("content"), i * every_n_bytes + 1, every_n_bytes),
    )
    return media.select("media_id", F.when(F.length("content") >= every_n_bytes, frames)
                        .otherwise(F.array().cast("array<binary>")).alias("frames"))
