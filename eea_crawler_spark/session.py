"""SparkSession factory tuned for this engine.

Used by bench.py and tests; the driver harness supplies its own session to
``__spark_entry__`` so everything downstream must also work on a session it
did not create (``sources.tables`` sets the per-query SQL confs it needs at
read time).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

# Shuffle partitions are sized from the data, not hardcoded: one partition
# per ~64 MB of input, so a 17 MB test SF runs single-partition (no
# scheduling overhead for empty tasks) while 100 TB yields ~1.6 M capped to
# 10 k pre-AQE partitions that adaptive coalescing then right-sizes.
_TARGET_PARTITION_BYTES = 64 << 20
_MAX_SHUFFLE_PARTITIONS = 10_000
# Below this input volume there is nothing for AQE to adapt (every stage is
# a handful of partitions already) and its per-stage replanning latency
# dominates: measured ~3 s across the 32-query bench at sf0.1 (17.6 MB).
# Above it AQE's runtime re-plan pays for itself immediately — at sf1
# (176 MB) converting q7's post-filter joins to broadcast at runtime is
# worth ~2.4 s on that one query, far more than the replanning cost. The
# boundary sits where intermediate results become large enough that static
# planning (no CBO, no post-join cardinalities) picks sort-merge joins AQE
# would undo: ~128 MB.
_AQE_MIN_BYTES = 1 << 27


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def scaled_shuffle_partitions(data_dir: str | None, cpus: int) -> tuple[int, bool]:
    """(shuffle partitions, enable AQE) sized to the input volume.

    Below one partition's worth of data (64 MB) every reduce collapses
    to a single task — scheduling 32 empty tasks per trivial stage was
    measured pure overhead at sf0.1. Past that point the floor is one
    partition per core: at sf1 (176 MB) the byte count alone gives 2-3
    partitions and join/agg reduce stages run on 2 of 32 cores (q7 paid
    ~2× for it). The cap (10 k) and the bytes-based growth are
    unchanged, so production sizing is identical.
    """
    if data_dir is None or not os.path.isdir(data_dir):
        return max(cpus, 2), True
    total = _dir_bytes(data_dir)
    parts = -(-total // _TARGET_PARTITION_BYTES)  # ceil
    if parts > 1:
        parts = min(max(parts, cpus), _MAX_SHUFFLE_PARTITIONS)
    parts = max(1, parts)
    return int(parts), total >= _AQE_MIN_BYTES


_MEM_UNITS = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
_MEM_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*([kmgt]?)b?\s*$")


def _parse_mem(mem: str) -> int:
    """Spark-grammar byte strings: '12g', '12gb', '512m', bare bytes.
    Must accept everything spark.driver.memory accepts — this value
    went to Spark verbatim before the threshold derivation existed,
    so a narrower grammar here would turn a previously-valid env
    setting into a startup crash."""
    m = _MEM_RE.match(mem.lower())
    if not m:
        raise ValueError(
            f"unparseable memory string {mem!r} (expected e.g. '12g', '512mb')"
        )
    return int(float(m.group(1)) * _MEM_UNITS[m.group(2)])


def _shj_threshold_bytes(mem: str, cpus: int) -> int:
    """AQE shuffled-hash conversion cap = per-task share of the unified
    execution pool / 2, clamped to [16 MB, 256 MB];
    SPARK_GRAFT_SHJ_THRESHOLD overrides (0 disables).

    Two measured anchors picked this. (1) q7 at sf100 loses its
    sort-skipping conversion below ~75 MB (the 600M-row exchange's
    build side sits at ~40–75 MB compressed per partition): best-of
    25.8–26.5 s at 75m/128m/256m vs 29–35 s at 18m/40m — so the cap
    must sit comfortably above that band. (2) A 5M-doc sync OOMed
    building SHJ hash maps at 256m — but the enabling condition was
    ~7.5 GB of corpus checkpoint blocks squatting in the unified pool
    (SHJ builds, unlike SMJ sorts, cannot spill); that is fixed at the
    source (the fetch/scrape checkpoints store DISK_ONLY, pipeline.py),
    and the same sweep passes at this threshold with the pool free.
    The /2 keeps ONE task's decompressed build (~4× the compressed
    number AQE compares) within a few tasks' fair share of the pool —
    concurrent builds can evict unprotected storage, so the fair-share
    bound need not hold for all 32 at once."""
    env = os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD")
    if env:
        return _parse_mem(env)
    pool = max(0, _parse_mem(mem) - (300 << 20)) * 0.6
    return int(min(256 << 20, max(16 << 20, pool / max(cpus, 1) / 2)))


def get_spark(
    app_name: str = "eea_crawler_spark",
    cpus: int | None = None,
    data_dir: str | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    parts, aqe = scaled_shuffle_partitions(data_dir, cpus)
    # Heap sizing follows the data like the shuffle sizing does: the big
    # fixed pre-touched heap (rationale below) only pays for itself when
    # the workload will actually touch gigabytes — for small inputs a
    # 12 GB -Xms boot either thrashes a small host or burns ~2 min of
    # cold pre-touch for nothing. Below the AQE boundary default to a
    # lazily-grown 4 GB; env overrides win in both directions
    # (SPARK_GRAFT_DRIVER_MEM sizes it, SPARK_GRAFT_FIXED_HEAP=1/0
    # forces the pre-touch choice — bench.py pins both so measured
    # numbers keep the fault-stall-free profile).
    big_input = data_dir is not None and os.path.isdir(data_dir) and (
        _dir_bytes(data_dir) >= _AQE_MIN_BYTES
    )
    _mem = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "12g" if big_input else "4g"
    )
    _fixed_env = os.environ.get("SPARK_GRAFT_FIXED_HEAP")
    _fixed = _fixed_env == "1" if _fixed_env in ("0", "1") else big_input
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let AQE turn a planned sort-merge join into a shuffled hash
        # join when the measured build side is small per map partition:
        # skips sorting the (much larger) probe side — q7's 60M-row
        # lineitem sort at sf10. The threshold is sized from the
        # PER-TASK execution-memory share, not a flat 256m: in local
        # mode every core's build draws on ONE shared pool, so `cpus`
        # concurrent UnsafeHashedRelations (≈2× raw bytes with
        # overhead) must fit (heap − 300M) × 0.6 together. A flat 256m
        # OOM-killed the 5M-doc initial sync's envelope join — both
        # sides were stats-less checkpoints, the tie-break built the
        # WIDE side at ~235 MB/partition × 32 tasks. The tight bound
        # also breaks such ties correctly: only the genuinely small
        # side qualifies for the hint at all.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(_shj_threshold_bytes(_mem, cpus)),
        )
        # trust bucketed tables' sortBy order at scan time: every SMJ
        # on the bucketed state tables then skips the corpus-side Sort
        # (Spark 3 stopped claiming the order by default — SPARK-28632
        # — but the claim is still guarded by a ≤1-file-per-bucket
        # check, which this engine's bucketed writers guarantee by
        # repartitioning to one file per bucket before every write:
        # sinks.indexes.save_bucketed / sinks.lakehouse._write_base)
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python workers are reused across tasks, and glibc's default
        # per-thread arenas retain each task's allocation high-water
        # mark — measured as multi-GB RSS per worker on Arrow-heavy
        # grouped-map stages (the 1M×768 LSH verify). Two arenas keep
        # retention near one task's true peak at no measurable
        # throughput cost for these numpy-kernel workloads.
        .config("spark.executorEnv.MALLOC_ARENA_MAX", "2")
        # Python DataSource scans (sources/plone_datasource) prune
        # partitions and push the quick-mode date predicate remotely
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # PySpark wraps every public DataFrame/Column call with an
        # error-context capture that costs up to four py4j roundtrips
        # per call (getActiveSession, a conf read, origin set + clear)
        # plus a Python stack walk. Measured on the normalize chain:
        # plan BUILD 2.0 s → 1.1 s with the capture off (guide §1 —
        # driver time is part of query wall time at bench SF). The only
        # loss is the user-code file:line decoration on error messages;
        # errors themselves are unchanged.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        # local-mode has ONE JVM shared by all task threads: its heap is
        # the entire cluster's execution+storage memory. Size it fixed
        # (-Xms=-Xmx) and pre-touch it at JVM start: this sandbox
        # demand-faults fresh guest pages from the host at ~100 MB/s
        # (measured; GC time stayed ≤100 ms through 6-14 s task stalls),
        # so a lazily-growing heap turns every G1 expansion into a
        # multi-second straggler in whatever stage is running. Pre-touch
        # moves that cost to startup — once per boot it's expensive,
        # afterwards freed guest pages stay host-backed and a warm
        # pre-touch costs ~8 s. A real cluster sizes per-executor memory
        # instead, so this block is local-mode-only.
        .config("spark.driver.memory", _mem)
    )
    if _fixed:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Xms{_mem} -XX:+AlwaysPreTouch",
        )
    # profiling hook (scripts/profile_query.py): per-job wall breakdown
    # needs the event log; never set in bench/driver runs
    _evt = os.environ.get("SPARK_GRAFT_EVENT_LOG_DIR")
    if _evt:
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", f"file://{_evt}")
            # plain-text JSON so the profiler can parse without a
            # zstd module (Spark 4 compresses rolling logs by default)
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
