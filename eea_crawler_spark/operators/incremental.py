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
    (crawl_plone_restapi.py:131-157); ``force`` overrides like the
    manual ``ignore_delete_threshold`` flag. Pass the PRE-sync state:
    the reference's denominator is ``prev_es_docs_len``, captured before
    the sweep touches the index.

    Both counts come from ONE action — a single left join + aggregate —
    so the state projection is scanned once (round-1 review flagged the
    two separate ``count()`` jobs).
    """
    cand = deletion_candidates(state, listing, id_col)
    listed = (
        listing.select(F.col(id_col))
        .dropDuplicates([id_col])
        .withColumn("__listed", F.lit(True))
    )
    row = (
        state.select(F.col(id_col))
        .join(listed, on=id_col, how="left")
        .agg(
            F.count(F.lit(1)).alias("n_prev"),
            F.sum(
                F.when(F.col("__listed").isNull(), 1).otherwise(0)
            ).alias("n_del"),
        )
        .first()
    )
    n_prev, n_del = row["n_prev"], row["n_del"] or 0
    ratio = (100.0 * n_del / n_prev) if n_prev else 0.0
    return cand, force or ratio <= threshold_pct, ratio


def quarantine_fold(
    ledger: DataFrame,
    errored: DataFrame,
    id_col: str = "id",
    allowed_errors: int = ALLOWED_ERRORS,
    skip_runs: int = SKIP_RUNS,
) -> DataFrame:
    """A7: fold the current errored-doc set into the error-budget ledger.

    Reference-exact transition (d1_sync.py:110-133 ``test_errors``):
      - ledger entries whose doc is NO LONGER errored are dropped — a
        successful refetch clears the budget immediately (d1_sync.py:
        111-117), so transient flakiness never accumulates across
        unrelated runs;
      - a newly-errored doc enters at (error_cnt=1, skip_cnt=0), not
        yet skipped (:121-124);
      - at budget — ``error_cnt >= allowed_errors``, the reference's
        comparison (:126) — the doc is skipped and ``skip_cnt`` counts
        the skipped runs (:130-131);
      - once ``skip_cnt >= skip_runs`` the entry expires and is dropped
        (:127-128), so the doc gets retried fresh on its next errored
        run;
      - below budget, ``error_cnt`` increments (:133).

    ``errored`` is the set of ids whose stored doc currently has errors
    (the reference's ``elastic.get_all_ids_with_error`` scan). Output
    columns: (id, error_cnt, skip_cnt, skipped) — retained entries only.
    """
    er = errored.select(F.col(id_col)).distinct()
    led = ledger.select(
        F.col(id_col),
        F.col("error_cnt").alias("__ec"),
        F.col("skip_cnt").alias("__sc"),
    )
    m = er.join(led, on=id_col, how="left")
    in_ledger = F.col("__ec").isNotNull()
    at_budget = in_ledger & (F.col("__ec") >= allowed_errors)
    expired = at_budget & (F.col("__sc") >= skip_runs)
    new_err = (
        F.when(~in_ledger, F.lit(1))
        .when(at_budget, F.col("__ec"))
        .otherwise(F.col("__ec") + 1)
    )
    new_skip = (
        F.when(~in_ledger, F.lit(0))
        .when(at_budget, F.col("__sc") + 1)
        .otherwise(F.col("__sc"))
    )
    return m.filter(~expired).select(
        F.col(id_col),
        new_err.cast("int").alias("error_cnt"),
        new_skip.cast("int").alias("skip_cnt"),
        at_budget.alias("skipped"),
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
        # allowMissingColumns = schema evolution (Delta autoMerge twin):
        # a batch adding or lacking a column fills the other side NULL
        cur.unionByName(upd, allowMissingColumns=True)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_last_wins_broadcast(
    current: DataFrame,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "indexed_at",
) -> DataFrame:
    """``upsert_last_wins`` for SMALL update batches: zero state shuffle.

    The window formulation is the right plan when the batch is a
    meaningful fraction of the state, but a quick sync merges ~1% into
    a many-million-row table — and the union→window path then shuffles
    and sorts the ENTIRE state just to pick winners for 1% of keys
    (measured: the dominant cost of a 50k-into-5M merge). Here the
    state is never shuffled: the (small) update key set broadcasts into
    two narrow probes —

      1. the state's (key, order) rows for updated keys (a broadcast
         semi-join, column-pruned scan) decide which updates are stale
         (state newer than the update: the Delta twin's
         ``WHEN MATCHED AND u.order >= t.order`` condition);
      2. the state drops rows whose key a FRESH update replaces (a
         broadcast anti-join) and the fresh updates union in.

    Ties go to the update, exactly like the window path (idempotent
    under replay); equivalence is pinned by the strategy-parametrized
    merge tests. Scale contract: broadcasts carry only update KEYS —
    callers gate on batch row count (sinks.lakehouse.merge_upsert's
    ``strategy='broadcast'``).
    """
    w = W.partitionBy(key).orderBy(F.col(order_col).desc())
    upd = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # one probe row per key: a legacy/corrupt state table holding
    # duplicate rows for a key would otherwise duplicate the update row
    # through the left join below (max(order) is also the row the
    # staleness condition must compare against). Untouched duplicate
    # keys still pass through unchanged — deduping them would mean
    # scanning the state, which is exactly what this plan avoids; the
    # window strategy is the full-table repair path.
    state_ord = (
        current.select(F.col(key), F.col(order_col).alias("__s_ord"))
        .join(F.broadcast(upd.select(key)), key, "left_semi")
        .groupBy(key)
        .agg(F.max("__s_ord").alias("__s_ord"))
    )
    fresh = (
        upd.join(F.broadcast(state_ord), key, "left")
        .filter(
            F.col("__s_ord").isNull() | (F.col(order_col) >= F.col("__s_ord"))
        )
        .drop("__s_ord")
    )
    kept = current.join(F.broadcast(fresh.select(key)), key, "left_anti")
    return kept.unionByName(fresh, allowMissingColumns=True)


def delete_rows(
    table: DataFrame, doomed: DataFrame, id_col: str = "id"
) -> DataFrame:
    """S14: DELETE FROM table WHERE id IN (doomed) as an anti-join."""
    return table.join(doomed.select(F.col(id_col)), on=id_col, how="left_anti")
