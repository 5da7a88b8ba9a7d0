"""Incremental-sync operators as declared queries (SURVEY §2.3/§2.4).

Deterministic listing/state projections are derived from the ``orders``
and ``part`` tables so J1 (diff join), J2+J3 (guarded deletes), A7
(quarantine fold) and O4 (last-wins upsert) are all hash-checkable
against the DuckDB oracle — the same modular-arithmetic derivations are
written once here and restated verbatim in the SQL strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eea_crawler_spark.operators import incremental as INC
from eea_crawler_spark.sources.tables import load_table

# listing: ids %10 in 0..7; state: ids %10 in 1..8.
#   → %10 = 0 appears only in listing (new)
#   → %10 = 8 appears only in state (deletion candidate)
# state stamps differ for %4 = 0 (changed); errors recorded for %13 = 0.

_LISTING_SQL = """
  SELECT o_orderkey AS id, CAST(o_orderdate AS DATE) AS modified
  FROM orders WHERE o_orderkey % 10 < 8"""

_STATE_SQL = """
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 4 = 0
              THEN CAST(o_orderdate AS DATE) + 1
              ELSE CAST(o_orderdate AS DATE) END AS modified,
         CASE WHEN o_orderkey % 13 = 0 THEN ['err'] ELSE [] END AS errors
  FROM orders WHERE o_orderkey % 10 BETWEEN 1 AND 8"""


def _listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 < 8).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").cast("date").alias("modified"),
    )


def _state(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") % 10).between(1, 8)).select(
        F.col("o_orderkey").alias("id"),
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.date_add(F.col("o_orderdate").cast("date"), 1),
        )
        .otherwise(F.col("o_orderdate").cast("date"))
        .alias("modified"),
        F.when(F.col("o_orderkey") % 13 == 0, F.array(F.lit("err")))
        .otherwise(F.array().cast("array<string>"))
        .alias("errors"),
    )


def sync_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = INC.sync_diff(_listing(spark, sf_dir), _state(spark, sf_dir))
    return out.select("id", "modified", "change_type").orderBy("id")


def sync_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = INC.deletion_candidates(_state(spark, sf_dir), _listing(spark, sf_dir))
    return cand.select("id", "modified").orderBy("id")


def sync_delete_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 as aggregates: one row (n_prev, n_del, ratio_pct, allowed)."""
    state = _state(spark, sf_dir)
    cand = INC.deletion_candidates(state, _listing(spark, sf_dir))
    prev = state.agg(F.count(F.lit(1)).alias("n_prev"))
    dele = cand.agg(F.count(F.lit(1)).alias("n_del"))
    return prev.crossJoin(dele).select(
        "n_prev",
        "n_del",
        F.round(100.0 * F.col("n_del") / F.col("n_prev"), 4).alias("ratio_pct"),
        (
            100.0 * F.col("n_del") / F.col("n_prev")
            <= INC.DELETE_THRESHOLD_PCT
        ).alias("allowed"),
    )


def quarantine_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (reference-exact test_errors transition): even ids hold ledger
    entries, ids %3 == 0 are currently errored; entries for no-longer-
    errored docs drop, at-budget entries skip, expired entries drop."""
    p = load_table(spark, sf_dir, "part")
    ledger = p.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("id"),
        (F.col("p_partkey") % 4).cast("int").alias("error_cnt"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(INC.SKIP_RUNS))
        .otherwise(F.col("p_partkey") % 7)
        .cast("int")
        .alias("skip_cnt"),
    )
    errored = p.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("id")
    )
    return INC.quarantine_fold(ledger, errored).orderBy("id")


def upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    current = o.filter(F.col("o_orderkey") % 3 < 2).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").cast("date").alias("ord"),
        F.lit("cur").alias("origin"),
    )
    updates = o.filter(F.col("o_orderkey") % 3 > 0).select(
        F.col("o_orderkey").alias("id"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_add(F.col("o_orderdate").cast("date"), 1),
        )
        .otherwise(F.col("o_orderdate").cast("date"))
        .alias("ord"),
        F.lit("upd").alias("origin"),
    )
    out = INC.upsert_last_wins(current, updates, key="id", order_col="ord")
    return out.select("id", "ord", "origin").orderBy("id")


SYNC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sync_diff": sync_diff,
    "sync_deletes": sync_deletes,
    "sync_delete_guard": sync_delete_guard,
    "quarantine_update": quarantine_update,
    "upsert_last_wins": upsert_last_wins,
}

SYNC_ORACLE: dict[str, str] = {
    "sync_diff": f"""
WITH listing AS ({_LISTING_SQL}), state AS ({_STATE_SQL})
SELECT l.id, l.modified,
       CASE WHEN s.id IS NULL THEN 'new'
            WHEN len(s.errors) > 0 THEN 'error_retry'
            WHEN l.modified IS DISTINCT FROM s.modified THEN 'changed'
       END AS change_type
FROM listing l LEFT JOIN state s ON l.id = s.id
WHERE s.id IS NULL OR len(s.errors) > 0
   OR l.modified IS DISTINCT FROM s.modified
ORDER BY l.id""",
    "sync_deletes": f"""
WITH listing AS ({_LISTING_SQL}), state AS ({_STATE_SQL})
SELECT id, modified FROM state
WHERE id NOT IN (SELECT id FROM listing) ORDER BY id""",
    "sync_delete_guard": f"""
WITH listing AS ({_LISTING_SQL}), state AS ({_STATE_SQL}),
cand AS (SELECT id FROM state WHERE id NOT IN (SELECT id FROM listing)),
c AS (SELECT (SELECT COUNT(*) FROM state) AS n_prev,
             (SELECT COUNT(*) FROM cand) AS n_del)
SELECT n_prev, n_del,
       ROUND(100.0 * n_del / n_prev, 4) AS ratio_pct,
       100.0 * n_del / n_prev <= {INC.DELETE_THRESHOLD_PCT} AS allowed
FROM c""",
    "quarantine_update": f"""
WITH ledger AS (
  SELECT p_partkey AS id,
         CAST(p_partkey % 4 AS INT) AS error_cnt,
         CAST(CASE WHEN p_partkey % 11 = 0 THEN {INC.SKIP_RUNS}
                   ELSE p_partkey % 7 END AS INT) AS skip_cnt
  FROM part WHERE p_partkey % 2 = 0),
errored AS (SELECT p_partkey AS id FROM part WHERE p_partkey % 3 = 0),
m AS (
  SELECT e.id, l.error_cnt AS ec, l.skip_cnt AS sc,
         l.id IS NOT NULL AS in_l
  FROM errored e LEFT JOIN ledger l ON e.id = l.id)
SELECT id,
       CAST(CASE WHEN NOT in_l THEN 1
                 WHEN ec >= {INC.ALLOWED_ERRORS} THEN ec
                 ELSE ec + 1 END AS INT) AS error_cnt,
       CAST(CASE WHEN NOT in_l THEN 0
                 WHEN ec >= {INC.ALLOWED_ERRORS} THEN sc + 1
                 ELSE sc END AS INT) AS skip_cnt,
       (in_l AND ec >= {INC.ALLOWED_ERRORS}) AS skipped
FROM m
WHERE NOT (in_l AND ec >= {INC.ALLOWED_ERRORS} AND sc >= {INC.SKIP_RUNS})
ORDER BY id""",
    "upsert_last_wins": """
WITH cur AS (
  SELECT o_orderkey AS id, CAST(o_orderdate AS DATE) AS ord,
         'cur' AS origin, 0 AS src
  FROM orders WHERE o_orderkey % 3 < 2),
upd AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 2 = 0
              THEN CAST(o_orderdate AS DATE) + 1
              ELSE CAST(o_orderdate AS DATE) END AS ord,
         'upd' AS origin, 1 AS src
  FROM orders WHERE o_orderkey % 3 > 0),
u AS (SELECT * FROM cur UNION ALL SELECT * FROM upd),
r AS (SELECT id, ord, origin,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY ord DESC, src DESC)
               AS rn
      FROM u)
SELECT id, ord, origin FROM r WHERE rn = 1 ORDER BY id""",
}
