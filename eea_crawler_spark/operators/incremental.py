"""Incremental sync engine: diff joins, guarded deletes, quarantine, upsert.

The reference's core custom logic (SURVEY.md §2.3/§2.4): every sync
compares what the source currently lists against the stored state and
only refetches what changed (``crawl_plone_restapi.py:145-161``),
detects deletions as state-minus-listing (``:160-198``) behind a
percentage safety valve (``:172-198``), quarantines error-prone docs by
budget (``dags/d1_sync.py:82-140``), and upserts by id with last-write-
wins (``logstash/pipeline/search_pipeline.conf:14-18``).

Spark shapes: J1 is a null-safe left join + change-predicate filter,
J2 a left-anti join, J3 two scalar aggregates feeding a driver-side
decision, A7 a keyed full-outer fold, O4 a union + ROW_NUMBER() = 1
(Delta ``MERGE INTO`` is the production twin; expressed engine-neutral
here so the semantics are testable on plain parquet).

Scale: all joins key on the document id — high-cardinality, uniformly
hashable, so the shuffles partition evenly at any corpus size; when the
state side is a compact (id, modified, errors) projection it broadcast-
joins under AQE's threshold automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

ALLOWED_ERRORS = 2  # allowed_errors_for_doc, dags/variables.json:96
SKIP_RUNS = 100  # skip_doc_cnt, dags/variables.json:116
DELETE_THRESHOLD_PCT = 25  # crawl_plone_restapi.py:81


def sync_diff(
    listing: DataFrame,
    state: DataFrame,
    id_col: str = "id",
    modified_col: str = "modified",
    errors_col: str = "errors",
) -> DataFrame:
    """J1: listing rows that need (re)fetching, with a change_type tag.

    A doc is due when it is new (no state), its ``modified`` stamp
    differs from the stored one, or its last crawl recorded errors
    (crawl_plone_restapi.py:145-161 — the in-Python dict lookup becomes
    a left outer join on id).
    """
    st = state.select(
        F.col(id_col).alias("__sid"),
        F.col(modified_col).alias("__smod"),
        F.col(errors_col).alias("__serr"),
    )
    joined = listing.join(st, listing[id_col] == st["__sid"], "left")
    change = (
        F.when(F.col("__sid").isNull(), F.lit("new"))
        .when(F.size(F.coalesce(F.col("__serr"), F.array())) > 0, F.lit("error_retry"))
        .when(
            ~F.col(modified_col).eqNullSafe(F.col("__smod")), F.lit("changed")
        )
        .otherwise(F.lit(None))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .drop("__sid", "__smod", "__serr")
    )


def deletion_candidates(
    state: DataFrame, listing: DataFrame, id_col: str = "id"
) -> DataFrame:
    """J2: stored ids the source no longer lists (left-anti join)."""
    return state.join(
        listing.select(F.col(id_col)), on=id_col, how="left_anti"
    )


def guarded_deletes(
    state: DataFrame,
    listing: DataFrame,
    id_col: str = "id",
    threshold_pct: int = DELETE_THRESHOLD_PCT,
    force: bool = False,
) -> tuple[DataFrame, bool, float]:
    """J2+J3: deletion candidates behind the percentage safety valve.

    Returns (candidates, allowed, ratio_pct). ``allowed`` is False when
    the candidates exceed ``threshold_pct``% of the stored corpus — the
    reference aborts the sweep rather than mass-delete on a bad listing
    (crawl_plone_restapi.py:172-198); ``force`` overrides like the
    manual re-run flag. The two counts are scalar aggregates (driver
    decision, not per-row logic).
    """
    cand = deletion_candidates(state, listing, id_col)
    n_prev = state.count()
    n_del = cand.count()
    ratio = (100.0 * n_del / n_prev) if n_prev else 0.0
    return cand, force or ratio <= threshold_pct, ratio


def quarantine_fold(
    ledger: DataFrame,
    failures: DataFrame,
    id_col: str = "id",
    allowed_errors: int = ALLOWED_ERRORS,
    skip_runs: int = SKIP_RUNS,
) -> DataFrame:
    """A7: fold one sync's failures into the error-budget ledger.

    Semantics (d1_sync.py:82-140 budgets): a failure increments
    ``error_cnt``; once a doc exceeds ``allowed_errors`` it is skipped
    and ``skip_cnt`` counts the skipped runs; after ``skip_runs`` skips
    the budget resets so the doc gets retried. Output columns:
    (id, error_cnt, skip_cnt, skipped).
    """
    fl = failures.select(F.col(id_col).alias(id_col)).distinct().withColumn(
        "__failed", F.lit(True)
    )
    merged = ledger.join(fl, on=id_col, how="full_outer")
    err = F.coalesce(F.col("error_cnt"), F.lit(0)) + F.when(
        F.coalesce(F.col("__failed"), F.lit(False)), 1
    ).otherwise(0)
    skip = F.coalesce(F.col("skip_cnt"), F.lit(0))
    expired = skip >= skip_runs
    new_err = F.when(expired, F.lit(0)).otherwise(err)
    skipped = new_err > allowed_errors
    new_skip = F.when(expired, F.lit(0)).otherwise(
        F.when(skipped, skip + 1).otherwise(F.lit(0))
    )
    return merged.select(
        F.col(id_col),
        new_err.cast("int").alias("error_cnt"),
        new_skip.cast("int").alias("skip_cnt"),
        skipped.alias("skipped"),
    )


def quarantine_filter(
    listing: DataFrame, ledger: DataFrame, id_col: str = "id"
) -> DataFrame:
    """P9: drop listed docs that are currently quarantined (anti-join)."""
    skip_ids = ledger.filter(F.col("skipped")).select(F.col(id_col))
    return listing.join(skip_ids, on=id_col, how="left_anti")


def upsert_last_wins(
    current: DataFrame,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "indexed_at",
) -> DataFrame:
    """O4/S11: keyed last-write-wins merge (idempotent upsert).

    union → ROW_NUMBER() over (key ORDER BY order_col DESC, source
    preference) = 1. Updates win ties so re-applying the same batch is
    a no-op (at-least-once delivery safe). Production twin: Delta
    ``MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT``.
    """
    cur = current.withColumn("__src", F.lit(0))
    upd = updates.withColumn("__src", F.lit(1))
    w = W.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    return (
        cur.unionByName(upd)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def delete_rows(
    table: DataFrame, doomed: DataFrame, id_col: str = "id"
) -> DataFrame:
    """S14: DELETE FROM table WHERE id IN (doomed) as an anti-join."""
    return table.join(doomed.select(F.col(id_col)), on=id_col, how="left_anti")
