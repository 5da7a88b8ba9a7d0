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
- ``mor`` backend — merge-on-read parquet (the Hudi-MOR / Iceberg
  merge-on-read shape): each merge APPENDS its batch as a small
  segment under ``<path>/_mor/`` — O(batch) write I/O — and
  ``read_table`` resolves last-wins at read time by splitting the base
  on the (small, broadcast) segment key set. Segments fold into the
  base when they outgrow ``MOR_COMPACT_FRACTION`` of it, bounding read
  amplification. This exists because the copy-on-write twin below
  rewrites O(corpus) per merge — measured as MOST of the 42.5 s
  quick-sync floor at 5M docs — and no fixed partition layout can
  avoid that for uniformly-spread churn: 50k changed keys over N hash
  buckets leave ~N·e^(−50k/N) buckets untouched ≈ 0 for any practical
  N, so dynamic-partition-overwrite pruning degenerates to the same
  full rewrite.
- ``parquet`` backend — plan-level merge (union + ROW_NUMBER last-wins
  / anti-join) then write-beside-and-swap. Correct semantics, O(table)
  I/O per merge: the copy-on-write emulation, still the right call for
  batches that are a large fraction of the state.

Backend choice per table is sticky: an existing table's format wins
(``_delta_log`` / ``_mor`` presence), a new table is created in Delta
iff the session supports it. Tests cover all twins; the Delta leg
self-skips where delta-spark is absent.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from eea_crawler_spark.operators.incremental import upsert_last_wins

# Segments fold into the base once their on-disk bytes exceed this
# fraction of the base: keeps the resolve-time key broadcast and the
# extra base probe bounded while amortizing the O(corpus) rewrite over
# ~1/fraction merges. At 1% churn per sync that is a full rewrite every
# ~10 syncs instead of every sync.
MOR_COMPACT_FRACTION = 0.10
_MOR_DIR = "_mor"  # leading underscore: invisible to plain parquet scans


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


def is_mor_table(path: str) -> bool:
    """Merge-on-read layout sniff: a ``_mor`` dir beside the base files."""
    return os.path.isdir(os.path.join(path, _MOR_DIR))


def table_exists(path: str) -> bool:
    return os.path.exists(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Format-dispatched state read (MOR tables resolve last-wins)."""
    if is_delta_table(path):
        return spark.read.format("delta").load(path)
    if is_mor_table(path):
        return _mor_read(spark, path)
    return spark.read.parquet(path)


def _pick_backend(spark: SparkSession, path: str, backend: str) -> str:
    if backend != "auto":
        return backend
    if table_exists(path):
        if is_delta_table(path):
            return "delta"
        return "mor" if is_mor_table(path) else "parquet"
    return "delta" if delta_available(spark) else "parquet"


# ---- merge-on-read twin ---------------------------------------------------


def _mor_spec_path(path: str) -> str:
    return os.path.join(path, _MOR_DIR, "spec.json")


def _mor_segments(path: str) -> list[str]:
    """Segment dirs in commit order (zero-padded names sort correctly)."""
    return sorted(_glob.glob(os.path.join(path, _MOR_DIR, "seg_*")))


def _mor_init(path: str, key: str, order_col: str) -> None:
    """Mark a table merge-on-read (idempotent; key/order are per-table
    invariants — a mismatch is a caller bug, not a merge to attempt)."""
    os.makedirs(os.path.join(path, _MOR_DIR), exist_ok=True)
    spec_path = _mor_spec_path(path)
    spec = {"key": key, "order_col": order_col}
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            existing = json.load(f)
        if existing != spec:
            raise ValueError(
                f"MOR table {path} was created with {existing}, "
                f"merge called with {spec}"
            )
        return
    with open(spec_path, "w") as f:
        json.dump(spec, f)


def _mor_spec(path: str) -> dict:
    with open(_mor_spec_path(path)) as f:
        return json.load(f)


def _mor_append(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Commit one segment: write beside, rename into place (the rename
    is the commit point — readers glob ``seg_*`` only)."""
    mor = os.path.join(path, _MOR_DIR)
    tmp = os.path.join(mor, f"_tmp_{uuid.uuid4().hex[:8]}")
    try:
        batch.write.mode("overwrite").parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)  # no stale half-segments
        raise
    n = len(_mor_segments(path)) + 1
    os.rename(tmp, os.path.join(mor, f"seg_{n:06d}"))


def _mor_read(spark: SparkSession, path: str) -> DataFrame:
    """Resolve base + segments to the last-wins view.

    Per key, sequentially folding the merges (each upsert wins iff its
    ``order_col`` >= the current row's; each delete unconditionally
    clears) leaves exactly the live row that is lexicographically
    maximal in (order_col, segment seq) among rows newer than the key's
    last tombstone — so one window computes the fold's fixpoint.

    The base is split on the segment key set (small by the compaction
    bound, hence broadcast): untouched keys stream through with NO
    shuffle; only segment-key rows enter the window. Read amplification
    vs plain parquet: one extra (pruned, semi-joined) base probe plus a
    changed-keys-sized shuffle — both O(segments), not O(corpus).
    """
    base = spark.read.parquet(path)  # `_mor` is invisible: `_` prefix
    segs = _mor_segments(path)
    if not segs:
        return base
    spec = _mor_spec(path)
    key, order_col = spec["key"], spec["order_col"]
    sdf = None
    for i, d in enumerate(segs):
        s = spark.read.parquet(d).withColumn("__mor_seq", F.lit(i + 1))
        sdf = s if sdf is None else sdf.unionByName(s, allowMissingColumns=True)
    keys = sdf.select(key).distinct()
    aff = (
        base.join(F.broadcast(keys), [key], "left_semi")
        .withColumn("__mor_op", F.lit("u"))
        .withColumn("__mor_seq", F.lit(0))
        .unionByName(sdf, allowMissingColumns=True)
    )
    dseq = F.max(
        F.when(F.col("__mor_op") == "d", F.col("__mor_seq")).otherwise(F.lit(-1))
    ).over(W.partitionBy(key))
    live = aff.withColumn("__mor_dseq", dseq).filter(
        (F.col("__mor_op") == "u") & (F.col("__mor_seq") > F.col("__mor_dseq"))
    )
    wr = W.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col("__mor_seq").desc()
    )
    winners = (
        live.withColumn("__mor_rn", F.row_number().over(wr))
        .filter(F.col("__mor_rn") == 1)
        .drop("__mor_op", "__mor_seq", "__mor_dseq", "__mor_rn")
    )
    untouched = base.join(F.broadcast(keys), [key], "left_anti")
    return untouched.unionByName(winners, allowMissingColumns=True)


def _dir_bytes(path: str, top_only: bool = False) -> int:
    total = 0
    for root, dirs, files in os.walk(path):
        if top_only:
            dirs.clear()
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _mor_compact(spark: SparkSession, path: str) -> None:
    """Unconditional fold: rewrite the resolved view as the new base
    (write-beside-and-swap, like the copy-on-write twin) — O(corpus),
    the cost the segment appends amortize. The table stays MOR."""
    spec = _mor_spec(path)
    resolved = _mor_read(spark, path)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    resolved.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    _mor_init(path, spec["key"], spec["order_col"])
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(tmp)


def _mor_maybe_compact(spark: SparkSession, path: str) -> None:
    """Fold segments into the base once they outgrow the fraction bound."""
    seg_bytes = _dir_bytes(os.path.join(path, _MOR_DIR))
    base_bytes = _dir_bytes(path, top_only=True)
    if seg_bytes <= MOR_COMPACT_FRACTION * max(base_bytes, 1):
        return
    _mor_compact(spark, path)


def compact_table(spark: SparkSession, path: str, force: bool = True) -> None:
    """Operational compaction entry (the `OPTIMIZE` twin): fold a MOR
    table's segments into its base now instead of waiting for the
    fraction bound — e.g. before a bulk read-heavy window or a backup.
    ``force=False`` applies the normal bound instead. No-op for
    non-MOR tables."""
    if not is_mor_table(path):
        return
    if force and _mor_segments(path):
        _mor_compact(spark, path)
        return
    _mor_maybe_compact(spark, path)


def _mor_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    order_col: str,
) -> None:
    """O(batch) upsert: within-batch last-wins dedup (unique keys per
    segment make the resolve window deterministic), append, maybe
    compact. A pre-existing plain-parquet table converts in place —
    its files become the MOR base untouched."""
    src = _dedup_last_wins(updates, key, order_col)
    if not table_exists(path):
        src.write.parquet(path)
        _mor_init(path, key, order_col)
        return
    _mor_init(path, key, order_col)
    _mor_append(spark, path, src.withColumn("__mor_op", F.lit("u")))
    _mor_maybe_compact(spark, path)


def _mor_delete(
    spark: SparkSession, path: str, doomed: DataFrame, key: str
) -> None:
    """O(batch) keyed delete: a tombstone segment (key + op only)."""
    if not is_mor_table(path):
        raise ValueError(
            f"{path} is not a MOR table; an upsert creates the layout "
            "(the delete alone can't — it doesn't know the order column)"
        )
    tomb = (
        doomed.select(F.col(key))
        .distinct()
        .withColumn("__mor_op", F.lit("d"))
    )
    _mor_append(spark, path, tomb)
    _mor_maybe_compact(spark, path)


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

    ``strategy`` picks the parquet-twin merge plan (ignored on delta
    and mor, whose merges are O(changed files) / O(batch)): "window" =
    union → row_number, the right plan when the batch is state-sized;
    "broadcast" = the zero-state-shuffle small-batch plan
    (operators.incremental.upsert_last_wins_broadcast) — callers that
    know the batch is small (run_sync counts it first) pass this.

    ``backend="mor"`` appends the batch as a merge-on-read segment
    (see module docstring); an existing ``_mor`` table sticks to it
    under "auto", like Delta."""
    picked = _pick_backend(spark, path, backend)
    if picked == "mor":
        _mor_upsert(spark, path, updates, key, order_col)
        return
    if picked == "delta":
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

    # parquet emulation: read state → merge plan → write beside → swap.
    # read_table, NOT read.parquet: an explicit backend="parquet" merge
    # on a MOR table must fold the segments in (the swap then leaves a
    # plain table — a correct MOR→CoW conversion), never silently read
    # the stale base.
    if table_exists(path):
        current = read_table(spark, path)
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
    """Keyed delete: Delta ``MERGE … WHEN MATCHED DELETE`` (file-pruned),
    a tombstone segment on mor, or anti-join + swap on parquet."""
    picked = _pick_backend(spark, path, backend)
    if picked == "mor":
        _mor_delete(spark, path, doomed, key)
        return
    if picked == "delta":
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

    current = read_table(spark, path)  # MOR-aware (see merge_upsert)
    kept = current.join(doomed.select(key), on=key, how="left_anti")
    tmp = f"{path}__tmp_del"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(tmp)
