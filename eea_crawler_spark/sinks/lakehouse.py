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
  on the (small, broadcast-capped) segment key set; the whole segment
  log reads as ONE multi-path scan (the sequence number rides in the
  data), so the plan does not grow per segment. Segments fold into the
  base when they outgrow ``MOR_COMPACT_FRACTION`` of it, bounding read
  amplification; compaction writes the new base BESIDE the old one
  and commits by atomically flipping the base pointer in ``spec.json``
  (the superseded epoch is retained one more cycle, so concurrent
  readers never see a missing base). With ``n_buckets`` set at
  creation, the base is laid out bucketed+sorted on the key at every
  epoch — ``read_table_parts`` then serves the sync's id joins with
  zero state-side Exchange. This exists because the copy-on-write twin
  below rewrites O(corpus) per merge — measured as MOST of the 42.5 s
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
import hashlib
import json
import os
import re
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
# Absolute ceiling on broadcasting the segment key set at resolve time.
# The fraction bound is RELATIVE (10% of the base): on a large standing
# corpus the un-compacted key set can still reach hundreds of MB —
# past this cap the resolve probes fall back to plain (shuffle) joins
# instead of risking the driver/executor broadcast limits. 64 MiB of
# keys ≈ tens of millions of URL ids, far past any sane churn batch.
MOR_SEG_BROADCAST_MAX_BYTES = 64 << 20
# Below this batch size the append route is always right (a segment of
# <100k rows is a few tens of MB at most), so the direct-fold base-size
# probe — a footer count job — is skipped entirely for quick syncs.
MOR_DIRECT_FOLD_MIN_ROWS = 100_000
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
    """Merge-on-read layout sniff: a committed ``_mor/spec.json`` (the
    spec write is the layout's commit point — a bare ``_mor`` dir from
    an interrupted conversion is NOT a MOR table; its base files still
    read as plain parquet)."""
    return os.path.isfile(_mor_spec_path(path))


def table_exists(path: str) -> bool:
    """True when ``path`` holds a READABLE state table — a format marker
    (Delta log / MOR spec) or at least one parquet data file. A leftover
    empty or partially-written directory (an interrupted first write)
    is treated as absent, so first-run detection stays a recognizable
    "no table yet" instead of an opaque parquet schema-inference error
    downstream (round-8 ADVICE)."""
    if not os.path.isdir(path):
        return False
    if is_delta_table(path) or is_mor_table(path):
        return True
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


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


def _mor_write_spec(path: str, spec: dict) -> None:
    """Atomic spec commit: write-beside + ``os.replace`` (POSIX-atomic).
    The spec flip IS the compaction commit point — readers only ever
    see a complete spec naming a fully-written base."""
    sp = _mor_spec_path(path)
    tmp = sp + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, sp)


def _mor_spec(path: str) -> dict:
    with open(_mor_spec_path(path)) as f:
        spec = json.load(f)
    # tables written by the pre-pointer layout: base at top level,
    # nothing folded, no bucket spec
    spec.setdefault("base", None)
    spec.setdefault("folded", 0)
    spec.setdefault("n_buckets", None)
    return spec


_SEG_RE = re.compile(r"seg_(\d+)$")
_BASE_RE = re.compile(r"base_(\d+)$")


def _mor_segments(path: str, folded: int | None = None) -> list[str]:
    """LIVE segment dirs in commit order (zero-padded names sort
    correctly). Segments at or below the ``folded`` watermark (read
    from the spec when not supplied) are already merged into the
    current base — retained one compaction cycle for in-flight readers
    but hidden here, so a deferred or failed cleanup can never
    double-apply them."""
    if folded is None:
        folded = (
            _mor_spec(path)["folded"]
            if os.path.exists(_mor_spec_path(path))
            else 0
        )
    segs = sorted(_glob.glob(os.path.join(path, _MOR_DIR, "seg_*")))
    return [s for s in segs if int(_SEG_RE.search(s).group(1)) > folded]


def _mor_init(
    path: str, key: str, order_col: str, n_buckets: int | None = None
) -> None:
    """Mark a table merge-on-read (idempotent; key/order are per-table
    invariants — a mismatch is a caller bug, not a merge to attempt).
    ``n_buckets`` only applies when the spec is first written AND the
    base files were written bucketed (creation path); converting a
    pre-existing plain table records no bucket spec — its files carry
    no bucket ids to trust."""
    os.makedirs(os.path.join(path, _MOR_DIR), exist_ok=True)
    if os.path.exists(_mor_spec_path(path)):
        existing = _mor_spec(path)
        if (existing["key"], existing["order_col"]) != (key, order_col):
            raise ValueError(
                f"MOR table {path} was created with key={existing['key']!r} "
                f"order_col={existing['order_col']!r}, merge called with "
                f"key={key!r} order_col={order_col!r}"
            )
        return
    _mor_write_spec(
        path,
        {
            "key": key,
            "order_col": order_col,
            "base": None,
            "folded": 0,
            "n_buckets": n_buckets,
        },
    )


def _mor_next_seq(path: str, spec: dict) -> int:
    """Next segment number: strictly above every on-disk segment AND the
    folded watermark, so numbering keeps increasing across compactions
    (single writer per table — pipeline.app_lock — like every
    file-layout mutation here)."""
    nums = [
        int(_SEG_RE.search(s).group(1))
        for s in _glob.glob(os.path.join(path, _MOR_DIR, "seg_*"))
    ]
    return max(nums + [int(spec["folded"])]) + 1


def _mor_append(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Commit one segment: write beside, rename into place (the rename
    is the commit point — readers glob ``seg_*`` only). The segment's
    sequence number is stamped INTO the data (``__mor_seq``) so the
    whole segment log reads back as ONE multi-path scan instead of one
    plan node per segment."""
    spec = _mor_spec(path)
    n = _mor_next_seq(path, spec)
    mor = os.path.join(path, _MOR_DIR)
    tmp = os.path.join(mor, f"_tmp_{uuid.uuid4().hex[:8]}")
    try:
        batch.withColumn("__mor_seq", F.lit(n)).write.mode(
            "overwrite"
        ).parquet(tmp)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)  # no stale half-segments
        raise
    os.rename(tmp, os.path.join(mor, f"seg_{n:06d}"))


def _mor_base_location(path: str, spec: dict) -> str:
    return (
        path
        if spec["base"] is None
        else os.path.join(path, _MOR_DIR, spec["base"])
    )


def _bucketed_table_name(location: str) -> str:
    return (
        "mor_base_"
        + hashlib.sha1(os.path.abspath(location).encode()).hexdigest()[:16]
    )


def _write_base(
    spark: SparkSession,
    df: DataFrame,
    location: str,
    key: str,
    n_buckets: int | None,
) -> None:
    """Write a base file set. With a bucket spec: bucketed + sorted on
    the key, one file per bucket (repartition first — multi-file
    buckets silently re-sort in every SMJ, SPARK-24528; same rationale
    as ``sinks.indexes.save_bucketed``), so every id-keyed state join
    downstream plans with zero base-side Exchange."""
    if not n_buckets:
        df.write.mode("overwrite").parquet(location)
        return
    name = _bucketed_table_name(location)
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", location)
        .saveAsTable(name)
    )


def _mor_base_df(spark: SparkSession, path: str, spec: dict) -> DataFrame:
    loc = _mor_base_location(path, spec)
    if not spec["n_buckets"]:
        return spark.read.parquet(loc)
    name = _bucketed_table_name(loc)
    if not spark.catalog.tableExists(name):
        # bucket metadata only survives the catalog route, and the
        # in-memory catalog is per-session: re-register an EXTERNAL
        # bucketed table over the existing files (bucket ids ride in
        # the bucketBy file names) on each session's first read
        schema = spark.read.parquet(loc).schema
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE `{name}` ({ddl}) USING PARQUET "
            f"CLUSTERED BY (`{spec['key']}`) SORTED BY (`{spec['key']}`) "
            f"INTO {spec['n_buckets']} BUCKETS LOCATION '{loc}'"
        )
    else:
        spark.catalog.refreshTable(name)
    return spark.table(name)


def _mor_parts(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """Resolve a MOR table as ``(untouched, overrides, override_keys)``.

    ``read_table`` ≡ untouched ∪ overrides, key-disjoint. Per key,
    sequentially folding the merges (each upsert wins iff its
    ``order_col`` >= the current row's; each delete unconditionally
    clears) leaves exactly the live row that is lexicographically
    maximal in (order_col, segment seq) among rows newer than the key's
    last tombstone — so one window computes the fold's fixpoint for the
    override set.

    The base is split on the segment key set: untouched keys stream
    through with NO shuffle — and ``untouched`` PRESERVES the base
    scan's physical layout (a bucketed base → downstream id-keyed joins
    need no state-side Exchange; ``read_table_parts`` is the public
    seam the sync diff uses). Overrides and keys are O(segments). The
    key probes broadcast while the live segment bytes sit under
    ``MOR_SEG_BROADCAST_MAX_BYTES`` — the 10% compaction bound is
    relative to the base, so an absolute cap guards the broadcast on
    large standing corpora; past it the probes run as plain joins.
    ``(base, None, None)`` when no live segments.
    """
    spec = _mor_spec(path)
    key, order_col = spec["key"], spec["order_col"]
    base = _mor_base_df(spark, path, spec)
    segs = _mor_segments(path, spec["folded"])
    if not segs:
        return base, None, None
    # ONE scan node for the whole segment log (seq rides in the data);
    # mergeSchema unions evolved segment schemas like the resolve's
    # allowMissingColumns union does
    sdf = spark.read.option("mergeSchema", "true").parquet(*segs)
    # Legacy segments (pre-seq-in-data layout) carry no __mor_seq
    # column — the mergeSchema scan yields null there, and a null seq
    # would fail the live filter below, silently discarding every
    # un-compacted legacy upsert and un-counting legacy tombstones
    # (data loss on upgrade). The sequence is recoverable from the
    # segment directory name, so coalesce it in from the file path.
    # The pattern is anchored to the _mor dir: an unanchored
    # `seg_(\d+)` would take its FIRST match anywhere in the path, so
    # a table living under e.g. /data/seg_2024/ would stamp every
    # legacy segment with the same wrong sequence.
    seq_from_path = F.regexp_extract(
        F.input_file_name(), r"/" + _MOR_DIR + r"/seg_(\d+)/", 1
    ).cast("int")
    if "__mor_seq" not in sdf.columns:
        sdf = sdf.withColumn("__mor_seq", seq_from_path)
    else:
        sdf = sdf.withColumn(
            "__mor_seq", F.coalesce(F.col("__mor_seq"), seq_from_path)
        )
    seg_bytes = sum(_dir_bytes(s) for s in segs)
    hint = (
        F.broadcast
        if seg_bytes <= MOR_SEG_BROADCAST_MAX_BYTES
        else (lambda df: df)
    )
    keys = sdf.select(key).distinct()
    if seg_bytes > MOR_SEG_BROADCAST_MAX_BYTES and spec["n_buckets"]:
        # Past the cap the probes run as plain sort-merge joins. The
        # distinct leaves the key set hash-partitioned at the SESSION
        # default — a valid clustering, so EnsureRequirements resolves
        # the count mismatch by re-shuffling the BASE to that count
        # (and the planner then disables the bucketed scan as useless):
        # a full-corpus Exchange on every high-override resolve.
        # Co-partitioning the (small) key set into the bucket count
        # keeps the base exchange-free and sort-free instead.
        keys = keys.repartition(spec["n_buckets"], F.col(key))
    aff = (
        base.join(hint(keys), [key], "left_semi")
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
    untouched = base.join(hint(keys), [key], "left_anti")
    # the returned key set carries the same gated broadcast hint the
    # internal probes use — callers joining it inherit the cap decision
    return untouched, winners, hint(keys)


def _mor_read(spark: SparkSession, path: str) -> DataFrame:
    """The resolved last-wins view (see ``_mor_parts`` for the fold)."""
    untouched, winners, _keys = _mor_parts(spark, path)
    if winners is None:
        return untouched
    return untouched.unionByName(winners, allowMissingColumns=True)


def read_table_parts(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """Split state read for exchange-free downstream joins.

    Returns ``(untouched, overrides, override_keys)`` with
    ``read_table(path)`` ≡ untouched ∪ overrides and the two parts
    key-disjoint. For non-MOR tables (and segment-free MOR tables) the
    overrides are ``None`` and ``untouched`` is the whole table. The
    point of the seam: a MOR resolve ends in a union, which destroys
    the base's output partitioning for the planner — callers that join
    the state on its key (the sync diff, the deletion guard) instead
    join the big bucketed ``untouched`` side exchange-free and handle
    the small override side with broadcasts
    (``operators.incremental.sync_diff_parts``)."""
    if is_mor_table(path) and not is_delta_table(path):
        return _mor_parts(spark, path)
    return read_table(spark, path), None, None


def _dir_bytes(path: str, top_only: bool = False) -> int:
    total = 0
    for root, dirs, files in os.walk(path):
        if top_only:
            dirs.clear()
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _mor_compact(
    spark: SparkSession, path: str, batch: DataFrame | None = None
) -> None:
    """Fold the live segments into a NEW base epoch — O(corpus), the
    cost the segment appends amortize; the table stays MOR.

    Write-beside + one atomic spec flip: the new base is written under
    ``_mor/base_<epoch>`` (invisible until the spec names it), then
    ``spec.json`` flips the base pointer and the folded watermark in one
    ``os.replace``. A reader either resolves the previous epoch — whose
    files are RETAINED for one more compaction cycle — or the new one;
    there is no window where the base is missing (the round-6
    delete-then-rename swap race). Cleanup of artifacts superseded two
    epochs ago runs best-effort AFTER the flip; a crash mid-cleanup
    leaves garbage hidden by the pointer/watermark, never corruption.

    ``batch``: a corpus-sized update batch to merge INTO the fold —
    the direct-fold path for merges that would trigger compaction the
    moment their segment landed (a renormalize rewrites every row; the
    append-then-compact route pays the corpus write TWICE, measured
    87→63 s at 5M docs). Last-wins against the resolved view, same
    semantics as the segment route.
    """
    spec = _mor_spec(path)
    segs = _mor_segments(path, spec["folded"])
    if not segs and batch is None:
        return
    resolved = _mor_read(spark, path)
    if batch is not None:
        resolved = upsert_last_wins(
            resolved, batch, key=spec["key"], order_col=spec["order_col"]
        )
    max_seq = max(
        [int(_SEG_RE.search(s).group(1)) for s in segs] + [int(spec["folded"])]
    )
    old_rel = spec["base"]
    epoch = (int(_BASE_RE.search(old_rel).group(1)) if old_rel else 0) + 1
    new_rel = f"base_{epoch:06d}"
    _write_base(
        spark,
        resolved,
        os.path.join(path, _MOR_DIR, new_rel),
        spec["key"],
        spec["n_buckets"],
    )
    _mor_write_spec(path, {**spec, "base": new_rel, "folded": max_seq})
    spark.catalog.refreshByPath(path)
    # grace retention: keep exactly the just-superseded epoch; older
    # bases (and, once the base has left the top level, the epoch-0
    # top-level files) are two epochs stale — remove them
    keep = {new_rel, old_rel}
    for d in _glob.glob(os.path.join(path, _MOR_DIR, "base_*")):
        if os.path.basename(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_table_name(d)}`")
    if old_rel is not None:
        for f in _glob.glob(os.path.join(path, "*")):
            if os.path.basename(f) != _MOR_DIR and os.path.isfile(f):
                os.remove(f)
        spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_table_name(path)}`")
    # segments folded by the PREVIOUS flip (≤ its watermark) die now;
    # the ones folded THIS flip stay hidden until the next compaction
    for s in _glob.glob(os.path.join(path, _MOR_DIR, "seg_*")):
        if int(_SEG_RE.search(s).group(1)) <= spec["folded"]:
            shutil.rmtree(s, ignore_errors=True)


def _mor_maybe_compact(spark: SparkSession, path: str) -> None:
    """Fold segments into the base once they outgrow the fraction bound."""
    spec = _mor_spec(path)
    segs = _mor_segments(path, spec["folded"])
    if not segs:
        return
    seg_bytes = sum(_dir_bytes(s) for s in segs)
    base_bytes = _dir_bytes(
        _mor_base_location(path, spec), top_only=spec["base"] is None
    )
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
    if force:
        _mor_compact(spark, path)  # no-op when no live segments
        return
    _mor_maybe_compact(spark, path)


def _mor_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    order_col: str,
    n_buckets: int | None = None,
    batch_rows: int | None = None,
    unique_keys: bool = False,
) -> None:
    """O(batch) upsert: within-batch last-wins dedup (unique keys per
    segment make the resolve window deterministic), append, maybe
    compact. A pre-existing plain-parquet table converts in place —
    its files become the MOR base untouched (and therefore unbucketed:
    ``n_buckets`` only takes effect when this call CREATES the table,
    whose base is then written bucketed+sorted on the key and stays so
    through every compaction — the layout that makes the sync's
    state-side joins exchange-free, see ``read_table_parts``).

    ``batch_rows``: caller-known batch size (callers that already
    counted the batch pass it — counting here would re-execute the
    update plan). A batch at or past the compaction fraction of the
    base would trigger the fold the moment its segment landed — such
    batches skip the append and merge directly into the next base
    epoch (ONE corpus write instead of two).

    ``unique_keys``: the caller CONTRACTS the batch holds one row per
    key, so the within-batch dedup window is skipped. On a first write
    that window is a full shuffle + sort of the (wide) batch — at 5M
    docs it was the single largest slice of the initial sync's searchui
    merge wall (BASELINE round-8 decomposition) — and with unique keys
    it is a provable no-op. The MOR resolve stays deterministic because
    the per-segment uniqueness invariant the window existed to enforce
    holds by contract instead."""
    src = updates if unique_keys else _dedup_last_wins(updates, key, order_col)
    if not table_exists(path):
        _write_base(spark, src, path, key, n_buckets)
        _mor_init(path, key, order_col, n_buckets=n_buckets)
        return
    _mor_init(path, key, order_col)
    if batch_rows is not None and batch_rows >= MOR_DIRECT_FOLD_MIN_ROWS:
        # the base row count is a footer-statistics job (~0.2 s) —
        # probe only when the batch is big enough that direct-fold is
        # even conceivable, so quick-sync merges never pay it
        spec = _mor_spec(path)
        base_rows = _mor_base_df(spark, path, spec).count()
        if batch_rows >= MOR_COMPACT_FRACTION * base_rows:
            _mor_compact(spark, path, batch=src)
            return
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
    n_buckets: int | None = None,
    batch_rows: int | None = None,
    unique_keys: bool = False,
) -> None:
    """Keyed last-wins upsert; ties go to the update (idempotent under
    at-least-once replay) — identical semantics on both backends,
    pinned by the backend-parametrized merge tests.

    ``unique_keys``: caller contract that the batch holds AT MOST one
    row per key, which makes the within-batch last-wins dedup a no-op —
    it is skipped, saving a full batch shuffle + sort (the dominant
    cost of a corpus-sized first write; see ``_mor_upsert``). The sync
    pipeline's batches qualify by construction (one envelope per due
    id, one searchui row per changed id). A caller that passes this
    with duplicate keys gets whichever duplicate the merge encounters —
    the same class of contract as Delta's unique-source-key MERGE
    requirement.

    ``n_buckets``: bucket the state on its key at creation time (mor
    backend only) — every base rewrite stays bucketed+sorted, so the
    sync's id-keyed state joins plan with zero state-side Exchange
    (``read_table_parts``). Ignored for existing tables (the layout is
    a per-table invariant recorded in the MOR spec).

    ``strategy`` picks the parquet-twin merge plan (ignored on delta
    and mor, whose merges are O(changed files) / O(batch)): "window" =
    union → row_number, the right plan when the batch is state-sized;
    "broadcast" = the zero-state-shuffle small-batch plan
    (operators.incremental.upsert_last_wins_broadcast) — callers that
    know the batch is small (run_sync counts it first) pass this.

    ``backend="mor"`` appends the batch as a merge-on-read segment
    (see module docstring); an existing ``_mor`` table sticks to it
    under "auto", like Delta. ``batch_rows`` (caller-known batch size)
    lets a corpus-sized mor merge fold directly into the next base
    epoch instead of paying append + immediate compaction."""
    picked = _pick_backend(spark, path, backend)
    if picked == "mor":
        _mor_upsert(
            spark, path, updates, key, order_col,
            n_buckets=n_buckets, batch_rows=batch_rows,
            unique_keys=unique_keys,
        )
        return
    if picked == "delta":
        from delta.tables import DeltaTable

        src = (
            updates if unique_keys else _dedup_last_wins(updates, key, order_col)
        )
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
        merged = (
            updates if unique_keys else _dedup_last_wins(updates, key, order_col)
        )
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    was_mor = is_mor_table(path) if os.path.exists(path) else False
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    # the swap happened outside Spark: drop stale file-status cache
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(tmp)
    if was_mor:  # MOR→CoW conversion: drop any stale bucketed-base entry
        spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_table_name(path)}`")


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
        if is_mor_table(path):
            _mor_delete(spark, path, doomed, key)
            return
        # mor requested on a (still) plain table — e.g. a sync whose
        # first run fetched nothing but approved deletions, so the
        # upsert that would have converted the layout never ran. Fall
        # through to the parquet anti-join delete instead of failing
        # mid-sync; the next upsert converts the survivors in place.
        picked = "parquet"
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
