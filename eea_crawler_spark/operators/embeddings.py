"""Embedding pipeline: chunk → batch-embed → (doc, chunk, vector) rows.

The reference embeds 250-word overlapping chunks through an external
service into 768-d vectors (``dags/normalizers/lib/nlp.py:65-121``,
``dags/variables.json:2785-2795,2319-2327``; currently disabled at
``dags/normalizers/normalizer.py:41-42``). Here the chunker is a pure
column expression (functions/text.py ``word_chunks``) and the model
call is an Arrow-batched ``pandas_udf`` — the idiomatic Spark seam for
batch inference: one Python process per executor core, vectors built
per Arrow batch, no per-row overhead.

The model itself is STUBBED (no inference libs in this environment):
``fake_embed`` derives a deterministic unit-norm vector from the md5
digest of the text, so the plumbing — batching, schema
``array<float>``, chunk alignment by (doc_id, chunk_idx) rather than
the reference's fragile text-equality matching — is real and testable.
``real_embed_stub`` marks the sentence-transformers / endpoint seam.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from eea_crawler_spark.functions.text import word_chunks

EMBED_DIM = 8  # stub dim; production: 768 (dags/variables.json:2322)


def real_embed_stub(texts: list[str]) -> list[list[float]]:
    """Where a sentence-transformers model / serving endpoint would run."""
    raise NotImplementedError(
        "embedding inference requires a model runtime, not present here"
    )


def _fake_vector(text: str, dim: int) -> list[float]:
    # md5 → bytes → centered floats → L2-normalized; deterministic.
    # The norm is the EXPLICIT sqrt-of-sum-of-squares (sequential
    # float64 adds), not np.linalg.norm: dnrm2's overflow-scaling
    # rounds differently in the last ulp, and the plain form is what
    # the chunk_embed DuckDB oracle reproduces bit-for-bit in SQL
    # (hex-pair parse → centered bytes → sqrt(Σv²) → FLOAT4 cast).
    raw = hashlib.md5(text.encode("utf-8")).digest()
    need = (dim + len(raw) - 1) // len(raw)
    buf = (raw * need)[:dim]
    v = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
    v = v - 127.5
    nrm = float(np.sqrt((v * v).sum())) or 1.0
    return [float(x) for x in (v / nrm)]


def make_fake_embed(dim: int = EMBED_DIM):
    """Deterministic stub embedder at an arbitrary width — dim 768 is
    the reference's production vector size (variables.json:2322); the
    throughput test drives the Arrow batch path at that width."""

    # DataType object (not a DDL string): string return types are
    # parsed at decoration time and would need an active SparkSession
    @pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _fake_vector(t or "", dim))

    return _embed


fake_embed = make_fake_embed(EMBED_DIM)


def chunk_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: int = 250,
    overlap: int = 50,
) -> DataFrame:
    """Explode overlapping word chunks: (id, chunk_idx, chunk_text).

    Split materialized in an inner projection (lambda-boundary CSE —
    see functions.text.word_chunks_of_array)."""
    from eea_crawler_spark.functions.text import word_chunks_of_array

    return df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w")).select(
        F.col(id_col),
        F.posexplode(word_chunks_of_array(F.col("__w"), words, overlap)).alias(
            "chunk_idx", "chunk_text"
        ),
    )


def embed_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: int = 250,
    overlap: int = 50,
    embed: Column | None = None,
    target_partitions: int | None = None,
) -> DataFrame:
    """Chunk and embed: (id, chunk_idx, chunk_text, embedding).

    Alignment is positional (doc_id, chunk_idx) — the reference matched
    embeddings back to chunks by text equality (nlp.py:99-121), which
    breaks on duplicate chunk text; carrying the index through the UDF
    output removes that failure mode entirely.

    Parallelism: the embed UDF inherits the scan's partitioning — at
    scale input splits already fan the chunks out, and an unconditional
    repartition would pay a shuffle plus per-worker Python startup that
    dominates small batches (the round-3 chunk_embed regression: 32
    workers spun up for ~1k chunks of stub work). ``target_partitions``
    is the knob for the inverse case — an expensive real model fed from
    a narrow input (few splits, heavy per-chunk compute): set it to the
    cluster's parallelism and the chunk rows (NOT the docs — chunks are
    the unit the UDF consumes) are spread before the model runs.
    """
    chunks = chunk_texts(df, text_col, id_col, words, overlap)
    if target_partitions:
        chunks = chunks.repartition(target_partitions)
    embedder = embed if embed is not None else fake_embed(F.col("chunk_text"))
    return chunks.withColumn("embedding", embedder)
