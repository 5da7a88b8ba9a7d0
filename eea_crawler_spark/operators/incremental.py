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
# Ceiling on broadcasting the deletion-candidate id set in the sweep's
# duplicate-listing veto. The candidate set is unbounded — an empty or
# truncated source listing makes it corpus-sized, and that is exactly
# the disaster the delete threshold exists to catch GRACEFULLY; forcing
# a broadcast of millions of ids there risks a driver OOM before the
# threshold ever gets to say no. Ids are ~100 B URLs, so 500k rows is
# ~50 MB — comfortably under the default driver/broadcast limits; past
# it the veto probes run as plain shuffle joins (same result).
VETO_BROADCAST_MAX_IDS = 500_000


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


def sync_diff_parts(
    listing: DataFrame,
    parts: tuple[DataFrame, DataFrame | None, DataFrame | None],
    id_col: str = "id",
    modified_col: str = "modified",
    errors_col: str = "errors",
) -> DataFrame:
    """J1 over a split state read (``sinks.lakehouse.read_table_parts``).

    The MOR resolve ends in a union, which erases the base scan's
    output partitioning — diffing the resolved view re-shuffles the
    corpus-sized state side every sync. The parts are key-disjoint and
    cover the state exactly, so the diff splits losslessly along them:
    listing rows whose id a segment overrides diff against the (small)
    override rows; every other listing row diffs against the untouched
    base — which, laid out bucketed on the id, joins with ZERO
    state-side Exchange (the property ``save_bucketed`` proved for q7,
    extended to the sync path). A tombstoned id has no override row →
    'new', exactly the resolved view's answer. The key set arrives with
    the resolve's own gated broadcast hint already attached.
    """
    base, overrides, keys = parts
    if overrides is None:
        return sync_diff(listing, base, id_col, modified_col, errors_col)
    on_base = listing.join(keys, on=id_col, how="left_anti")
    on_seg = listing.join(keys, on=id_col, how="left_semi")
    return sync_diff(
        on_base, base, id_col, modified_col, errors_col
    ).unionByName(sync_diff(on_seg, overrides, id_col, modified_col, errors_col))


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


def guarded_deletes_parts(
    parts: tuple[DataFrame, DataFrame | None, DataFrame | None],
    listing: DataFrame,
    id_col: str = "id",
    threshold_pct: int = DELETE_THRESHOLD_PCT,
    force: bool = False,
) -> tuple[DataFrame, bool, float]:
    """``guarded_deletes`` over a split state read — same contract.

    The corpus-sized leg (untouched base × listing ids) is the only
    big join, and on a bucketed base it needs no state-side Exchange;
    the override rows are checked via broadcast probes of the listing
    (override keys are O(segments)). Counts: |state| = |untouched| +
    |overrides| (key-disjoint cover), candidates = the same anti-joins
    the resolved view would produce — tombstoned keys are in neither
    part, so they can never re-enter the deletion set.
    """
    base, overrides, _keys = parts
    if overrides is None:
        return guarded_deletes(base, listing, id_col, threshold_pct, force)
    listed = (
        listing.select(F.col(id_col))
        .dropDuplicates([id_col])
        .withColumn("__listed", F.lit(True))
    )
    agg = [
        F.count(F.lit(1)).alias("n_prev"),
        F.sum(F.when(F.col("__listed").isNull(), 1).otherwise(0)).alias(
            "n_del"
        ),
    ]
    row_b = (
        base.select(F.col(id_col)).join(listed, on=id_col, how="left").agg(*agg).first()
    )
    ov_keys = overrides.select(F.col(id_col))
    # which override keys the source still lists: one narrow broadcast
    # pass over the listing, then everything override-sized broadcasts
    listed_ov = listed.join(F.broadcast(ov_keys), on=id_col, how="left_semi")
    row_o = (
        ov_keys.join(F.broadcast(listed_ov), on=id_col, how="left")
        .agg(*agg)
        .first()
    )
    n_prev = row_b["n_prev"] + row_o["n_prev"]
    n_del = (row_b["n_del"] or 0) + (row_o["n_del"] or 0)
    cand = base.join(
        listed.select(F.col(id_col)), on=id_col, how="left_anti"
    ).unionByName(
        overrides.join(
            F.broadcast(listed_ov.select(F.col(id_col))),
            on=id_col,
            how="left_anti",
        ),
        allowMissingColumns=True,
    )
    ratio = (100.0 * n_del / n_prev) if n_prev else 0.0
    return cand, force or ratio <= threshold_pct, ratio


def sync_sweep_parts(
    lf: DataFrame,
    parts: tuple[DataFrame, DataFrame | None, DataFrame | None],
    id_col: str = "id",
    modified_col: str = "modified",
    errors_col: str = "errors",
    threshold_pct: int = DELETE_THRESHOLD_PCT,
    force: bool = False,
    fetchable_col: str = "__fetchable",
    preserved_col: str = "__preserved",
) -> tuple[DataFrame, DataFrame, DataFrame, int, int, bool, float]:
    """J1 + J2 + J3 (+ the quarantine's errored-id scan) in ONE
    corpus-join execution (the fused sweep).

    The separate diff and guard each join the same 5M×5M relations on
    the same key — and the guard's join used to execute TWICE (the
    ratio aggregate and the candidate materialization are separate
    actions), so a quick sync paid three O(corpus) join executions for
    one logical comparison. Here the listing arrives ONCE with its
    filter outcomes as flags (``fetchable`` = passes source filters and
    is not quarantined → eligible for the diff; ``preserved`` = passes
    filters OR is quarantined → protected from deletion, the
    reference's 'Document had errors' branch), full-outer-joins the
    state (split along ``read_table_parts`` — bucketed base side needs
    no Exchange), and only the due + candidate + errored rows —
    changed-set-sized on a quick sync — are checkpointed. Every
    downstream action (fetch input, envelope join, counts, deletes,
    the error-budget fold) is a filter over that small checkpoint;
    nothing re-executes a corpus join. |state| for the guard's
    denominator comes from a column-pruned count of the parts (parquet
    row-group counts — no join needed).

    The corpus pass is deliberately AGGREGATE-FREE: the reference's
    id-keyed dict fold of duplicate listing rows (flags by OR,
    attributes from one row) would cost a SortAggregate over the whole
    listing — ``first(string)``/``max(string)`` buffers can't hash-
    aggregate, measured as 2× sort + 2× shuffle of the 5M listing, run
    once per split leg — so each join row carries its OWN verdict, and
    duplicate-id exactness is restored on the tiny checkpoint instead:
    ``due`` folds to one row per id (latest ``modified`` wins — the
    dict semantics), and a candidate id with ANY preserved listing row
    is vetoed by one narrow broadcast probe of the listing, executed
    only when candidates exist at all (a zero-delete sync never pays
    it).

    Returns ``(due, doomed, errored, n_prev, n_del, allowed,
    ratio_pct)``: ``due`` = listing columns + change_type, ``doomed``
    = candidate ids, ``errored`` = ids whose PRE-sync stored row has
    errors (the quarantine fold's input — saves its own corpus scan);
    all are filters over the one eager checkpoint, so they survive the
    state-table swaps that follow.
    """
    base, overrides, keys = parts
    if overrides is not None:
        # the override fold (window over base-probe ∪ segments) executes
        # in the checkpoint job AND in the |overrides| count below — a
        # lazy local checkpoint materializes it once, in the first job
        overrides = overrides.localCheckpoint(eager=False)
    attrs = [
        c for c in lf.columns if c not in (id_col, fetchable_col, preserved_col)
    ]

    s_present = F.col("__sid").isNotNull()
    has_err = F.size(F.coalesce(F.col("__serr"), F.array())) > 0
    change = (
        F.when(~s_present, F.lit("new"))
        .when(has_err, F.lit("error_retry"))
        .when(~F.col(modified_col).eqNullSafe(F.col("__smod")), F.lit("changed"))
        .otherwise(F.lit(None))
    )
    is_due = (
        F.col(id_col).isNotNull()
        & F.coalesce(F.col(fetchable_col), F.lit(False))
        & change.isNotNull()
    )
    # per-row doubt: exact for unique listing ids; a duplicate-id flag
    # disagreement resolves in the post-checkpoint veto below
    is_cand = s_present & ~F.coalesce(F.col(preserved_col), F.lit(False))
    is_err = s_present & has_err

    def leg(Lx: DataFrame, Sx: DataFrame) -> DataFrame:
        S = Sx.select(
            F.col(id_col).alias("__sid"),
            F.col(modified_col).alias("__smod"),
            F.col(errors_col).alias("__serr"),
        )
        return (
            # shuffled-hash, build = listing: the bucketed state streams
            # through exchange-free AND sort-free (SMJ would sort both
            # sides; the listing's per-partition build map is corpus/
            # buckets rows — bounded by the same sizing that makes a
            # bucket fit an executor). Measured 1.4 s vs 2.0 s SMJ for
            # the 5M×5M full outer.
            Lx.hint("shuffle_hash").join(S, Lx[id_col] == S["__sid"], "full_outer")
            .withColumn("change_type", change)
            .withColumn("__due", is_due)
            .withColumn("__cand", is_cand)
            .withColumn("__err", is_err)
            .filter(F.col("__due") | F.col("__cand") | F.col("__err"))
            # candidate/errored rows carry their id on the state side only
            .withColumn(id_col, F.coalesce(F.col(id_col), F.col("__sid")))
            .drop("__sid", "__smod", "__serr", fetchable_col, preserved_col)
        )

    if overrides is None:
        small = leg(lf, base)
    else:
        # key-disjoint split, exact like sync_diff_parts: the FULL
        # listing meets the untouched (bucketed) base with no state-
        # side Exchange — overridden ids come out of that leg with a
        # stale verdict ('new') and are dropped by a broadcast anti
        # probe over its (small) output; the authoritative verdict for
        # them comes from the override leg
        small = leg(lf, base).join(keys, on=id_col, how="left_anti").unionByName(
            leg(lf.join(keys, on=id_col, how="left_semi"), overrides)
        )
    small = small.localCheckpoint(eager=True)

    # exact duplicate-id folds over the TINY checkpoint (never at
    # corpus scale): one due row per id, latest modified stamp wins
    due = (
        small.filter(F.col("__due"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(
                    F.col(modified_col).desc_nulls_last()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(id_col, *attrs, "change_type")
    )
    doomed = small.filter(F.col("__cand")).select(id_col).distinct()
    n_del = doomed.count()  # cheap: a filter over the checkpoint
    if n_del:
        # veto: an id the source lists with ANY preserved row is not a
        # deletion candidate (duplicate listing rows may disagree on
        # flags); one narrow probe of the checkpointed listing. The
        # broadcast hint is gated on n_del (just counted): a truncated
        # listing makes the candidate set corpus-sized, and the veto
        # must not OOM the driver before the threshold below gets to
        # abort gracefully — past the cap both probes shuffle instead.
        hint = (
            F.broadcast if n_del <= VETO_BROADCAST_MAX_IDS else (lambda d: d)
        )
        # distinct BEFORE the broadcast hint: the semi-join keeps
        # duplicate listing rows, so without it |vetoed| is bounded by
        # the raw listing, not by n_del — the cap above would then not
        # actually bound the second broadcast
        vetoed = (
            lf.filter(F.coalesce(F.col(preserved_col), F.lit(False)))
            .select(id_col)
            .join(hint(doomed), on=id_col, how="left_semi")
            .distinct()
        )
        doomed = doomed.join(
            hint(vetoed), on=id_col, how="left_anti"
        ).localCheckpoint(eager=True)
        n_del = doomed.count()
    errored = small.filter(F.col("__err")).select(id_col).distinct()
    n_prev = base.count() + (overrides.count() if overrides is not None else 0)
    ratio = (100.0 * n_del / n_prev) if n_prev else 0.0
    return due, doomed, errored, n_prev, n_del, force or ratio <= threshold_pct, ratio


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
