"""Normalize-chain throughput floor (BASELINE.md derived target).

Target: ≥ 200 docs/s/core through the full §2.5 chain, pure transform.
Measured ~4,000 docs/s/core on local[32] (whole chain codegen, zero
shuffles); the assertion floor is set 4× under the target's 2× so CI
noise can't flake it while a 10× regression (e.g. an accidental Python
UDF or a shuffle creeping into the chain) still fails loudly.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from eea_crawler_spark.operators.normalize_chain import (
    DEFAULT_CONFIG,
    common_normalizer,
)

RAW = json.dumps(
    {
        "title": " Air quality in Europe ",
        "description": "Overview of air quality.",
        "language": None,
        "language_token": "de",
        "review_state": "published",
        "themes": ["climate"],
        "taxonomy_themes": [{"token": "water", "title": "W"}],
        "subjects": ["air", "internal", "air"],
        "publishers": ["EEA (European Environment Agency)"],
        "object_provides": ["IDashboard"],
        "format": ["text/html"],
        "geo_coverage": {"geolocation": [{"label": "Europe"}]},
        "temporal_coverage": {"temporal": [{"label": "2020-2021"}]},
        "location": '{"features":[{"properties":{"title":"Berlin"}}]}',
    }
)

N_DOCS = 50_000
FLOOR_PER_CORE = 100  # docs/s/core; target 200, measured ~4000


def test_normalize_throughput_floor(spark):
    cores = spark.sparkContext.defaultParallelism
    base = spark.range(N_DOCS).select(
        F.concat(F.lit("https://site/doc"), F.col("id")).alias("id"),
        F.lit("Article").alias("doc_type"),
        F.lit(RAW).alias("raw_value"),
        F.lit("<html><body><p>Body text.</p></body></html>").alias("web_html"),
        F.lit(200).alias("status_code"),
        F.lit(None).cast("string").alias("pdf_text"),
        F.concat(F.lit("https://site/doc"), F.col("id")).alias("original_id"),
        F.lit("eea").alias("site_id"),
        F.array().cast("array<string>").alias("errors"),
        F.lit("2024-01-01").alias("modified"),
        F.lit("https://site").alias("site"),
        F.current_timestamp().alias("indexed_at"),
    )
    base = base.localCheckpoint(eager=True)  # generation out of the timing
    out = common_normalizer(base, DEFAULT_CONFIG)
    out.write.format("noop").mode("overwrite").save()  # warm codegen
    # best of 3: the floor guards against plan regressions (a stray
    # Python UDF or shuffle), not against transient machine load — one
    # contended run must not flake a 39x-margin assertion
    rate = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        rate = max(rate, N_DOCS / (time.perf_counter() - t0))
        if rate >= FLOOR_PER_CORE * cores:
            break
    assert rate >= FLOOR_PER_CORE * cores, (
        f"normalize throughput {rate:.0f} docs/s < floor "
        f"{FLOOR_PER_CORE * cores} on {cores} cores"
    )


# ---- chunk-embedding leg at the production vector width ----------------

N_EMBED_DOCS = 2_000
EMBED_DIM_PROD = 768  # dags/variables.json:2322-2323
EMBED_FLOOR_CHUNKS_S = 500  # chunks/s across the session; measured ~10x


def test_embed_throughput_dim768(spark, tmp_path):
    """The d5 embedding leg at the reference's production width: 250/50
    word chunks → dim-768 vectors (deterministic stub — the Arrow batch
    transfer, schema, and chunk alignment are the real thing) → keyed
    merge into the chunks table. Pins a chunks/s floor so an accidental
    per-row UDF or a misplaced shuffle in the embed path fails loudly."""
    from eea_crawler_spark.operators.embeddings import (
        chunk_texts,
        embed_chunks,
        make_fake_embed,
    )
    from eea_crawler_spark.sinks.indexes import upsert_index

    words = F.array_repeat(F.lit("word"), 500)
    docs = spark.range(N_EMBED_DOCS).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    ).localCheckpoint(eager=True)  # generation out of the timing
    n_chunks = chunk_texts(docs, words=250, overlap=50).count()
    assert n_chunks >= 2 * N_EMBED_DOCS  # 500 words / stride 200 → 3

    embed = make_fake_embed(EMBED_DIM_PROD)(F.col("chunk_text"))
    out = embed_chunks(docs, words=250, overlap=50, embed=embed)
    out.write.format("noop").mode("overwrite").save()  # warm codegen
    rate = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        rate = max(rate, n_chunks / (time.perf_counter() - t0))
        if rate >= EMBED_FLOOR_CHUNKS_S:
            break
    assert rate >= EMBED_FLOOR_CHUNKS_S, (
        f"dim-{EMBED_DIM_PROD} embed throughput {rate:.0f} chunks/s "
        f"< floor {EMBED_FLOOR_CHUNKS_S}"
    )

    # the chunks-table merge at production width: vectors survive the
    # keyed upsert round-trip intact
    table = str(tmp_path / "chunks")
    keyed = out.withColumns(
        {
            "chunk_id": F.concat_ws("#", "doc_id", "chunk_idx"),
            "indexed_at": F.current_timestamp(),
        }
    )
    upsert_index(spark, table, keyed.limit(500), key="chunk_id")
    got = spark.read.parquet(table)
    assert got.count() == 500
    first = got.select(F.size("embedding").alias("d")).first()
    assert first["d"] == EMBED_DIM_PROD
