"""Lakehouse state backend: Delta ``MERGE INTO`` with a parquet-swap twin.

The engine's state tables (raw, searchui, quarantine, chunks) need a
keyed last-wins upsert and a keyed delete. The production story is a
transactional lakehouse format — Delta's ``MERGE INTO`` / ``DELETE``
touch only the files holding matched keys (plus the transaction log),
so a 1-doc quick sync rewrites O(changed files), not O(corpus), and
readers never observe a half-written table. The reference gets the
same property from Elasticsearch's per-doc upsert
(``logstash/pipeline/search_pipeline.conf:12-29``).

This container does not ship delta-spark, so every call dispatches:

- ``delta`` backend — when the ``delta`` package is importable AND the
  session carries the Delta extension: real ``MERGE INTO`` /
  ``DELETE``, via ``DeltaTable``.
- ``parquet`` backend — plan-level merge (union + ROW_NUMBER last-wins
  / anti-join) then write-beside-and-swap. Correct semantics, O(table)
  I/O per merge: the acknowledged emulation for environments without a
  lakehouse runtime.

Backend choice per table is sticky: an existing table's format wins
(``_delta_log`` presence), a new table is created in Delta iff the
session supports it. Tests cover both; the Delta leg self-skips where
delta-spark is absent.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from eea_crawler_spark.operators.incremental import upsert_last_wins


def delta_available(spark: SparkSession) -> bool:
    """True when this session can execute Delta DML."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


def is_delta_table(path: str) -> bool:
    """Format sniff by transaction-log presence (local/posix paths; on
    object stores use ``DeltaTable.isDeltaTable`` via the delta leg)."""
    return os.path.isdir(os.path.join(path, "_delta_log"))


def table_exists(path: str) -> bool:
    return os.path.exists(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Format-dispatched state read."""
    if is_delta_table(path):
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def _pick_backend(spark: SparkSession, path: str, backend: str) -> str:
    if backend != "auto":
        return backend
    if table_exists(path):
        return "delta" if is_delta_table(path) else "parquet"
    return "delta" if delta_available(spark) else "parquet"


def _dedup_last_wins(updates: DataFrame, key: str, order_col: str) -> DataFrame:
    """Within-batch last-wins (Delta MERGE requires unique source keys)."""
    w = W.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "indexed_at",
    backend: str = "auto",
    strategy: str = "window",
) -> None:
    """Keyed last-wins upsert; ties go to the update (idempotent under
    at-least-once replay) — identical semantics on both backends,
    pinned by the backend-parametrized merge tests.

    ``strategy`` picks the parquet-twin merge plan (ignored on delta,
    whose MERGE INTO is already O(changed files)): "window" =
    union → row_number, the right plan when the batch is state-sized;
    "broadcast" = the zero-state-shuffle small-batch plan
    (operators.incremental.upsert_last_wins_broadcast) — callers that
    know the batch is small (run_sync counts it first) pass this."""
    if _pick_backend(spark, path, backend) == "delta":
        from delta.tables import DeltaTable

        src = _dedup_last_wins(updates, key, order_col)
        if not table_exists(path):
            src.write.format("delta").save(path)
            return
        mb = (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(src.alias("u"), f"t.`{key}` = u.`{key}`")
        )
        # schema-evolution parity with the parquet twin's
        # allowMissingColumns union: batches that add columns (nlp_250 /
        # chunk fields arriving after first write) or omit stored ones
        # (update-only renormalize) must merge, not throw. delta-spark
        # ≥3.1 has the per-merge builder; older runtimes use the session
        # autoMerge flag.
        if hasattr(mb, "withSchemaEvolution"):
            mb = mb.withSchemaEvolution()
        else:  # pragma: no cover - depends on delta-spark version
            spark.conf.set(
                "spark.databricks.delta.schema.autoMerge.enabled", "true"
            )
        (
            mb.whenMatchedUpdateAll(condition=f"u.`{order_col}` >= t.`{order_col}`")
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    # parquet emulation: read state → merge plan → write beside → swap
    if table_exists(path):
        current = spark.read.parquet(path)
        if strategy == "broadcast":
            from eea_crawler_spark.operators.incremental import (
                upsert_last_wins_broadcast,
            )

            merged = upsert_last_wins_broadcast(
                current, updates, key=key, order_col=order_col
            )
        else:
            merged = upsert_last_wins(
                current, updates, key=key, order_col=order_col
            )
    else:
        merged = _dedup_last_wins(updates, key, order_col)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    # the swap happened outside Spark: drop stale file-status cache
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(tmp)


def merge_delete(
    spark: SparkSession,
    path: str,
    doomed: DataFrame,
    key: str = "id",
    backend: str = "auto",
) -> None:
    """Keyed delete: Delta ``MERGE … WHEN MATCHED DELETE`` (file-pruned)
    or anti-join + swap on parquet."""
    if _pick_backend(spark, path, backend) == "delta":
        from delta.tables import DeltaTable

        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(
                doomed.select(key).distinct().alias("d"),
                f"t.`{key}` = d.`{key}`",
            )
            .whenMatchedDelete()
            .execute()
        )
        return

    current = spark.read.parquet(path)
    kept = current.join(doomed.select(key), on=key, how="left_anti")
    tmp = f"{path}__tmp_del"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(tmp)
