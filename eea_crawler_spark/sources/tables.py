"""Parquet table loaders for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an ``sf_dir``.

``events.ts`` is written as Parquet TIMESTAMP(NANOS). Depending on the
Spark runtime it arrives either as nanosecond longs (under
``spark.sql.legacy.parquet.nanosAsLong``) or as ``TIMESTAMP_NTZ``
(nanos truncated to micros by the reader). Both are normalized here to
a plain session-timezone ``TIMESTAMP``: the long path rebuilds it with
exact integer division (``ts div 1000`` — bit-identical to DuckDB's
nanos→micros truncation), the NTZ path casts (value-preserving under
the UTC session timezone). Downstream event-time code (watermarks,
``window()``/``session_window()``) requires TIMESTAMP — Spark rejects
NTZ event time in ``withWatermark``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Opt-in scan cache (bench.py): repeated single-table extras each pay a
# full parquet re-list/re-scan of the same small table — ~0.1-0.6 s per
# query at sf0.1, ~5 s across the declared extras. The bench caches the
# hot tables once (in-memory columnar) so per-query numbers measure the
# operator, not the repeated scan. Keyed by (applicationId, path) —
# applicationId is unique per SparkContext, where a stopped session's
# id(spark) can be REUSED by CPython and serve a DataFrame bound to a
# dead context. Nothing registers unless cache_tables() is called, so
# tests and production sessions are untouched; clear_table_cache()
# drops the entries (call it before spark.stop()).
_SCAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cache_key(spark: SparkSession, path: str) -> tuple[str, str]:
    return (spark.sparkContext.applicationId, path)


def cache_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...]
) -> None:
    for name in names:
        df = load_table(spark, sf_dir, name).cache()
        df.count()  # materialize now, outside any timed window
        _SCAN_CACHE[_cache_key(spark, table_path(sf_dir, name))] = df


def clear_table_cache() -> None:
    _SCAN_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    cached = _SCAN_CACHE.get(_cache_key(spark, path))
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Expose every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
