"""Redirect maintenance sweep: the reference's d6/d7 DAG pair as one job.

Reference shape (dags/d6_mark_redirects.py:10-39 →
dags/d7_mark_redirects_bulk.py:31-75): scan all searchui ids, keep the
``https://www.eea.europa.eu/publications`` prefix, chunk into 10k-doc
bulks on an 8-slot pool, HEAD-probe each URL, and emit an update-only
doc when the live redirect status disagrees with the stored
``exclude_from_globalsearch`` flag:

  - probe redirected, flag not 'redirected'  → set 'redirected'
  - probe clean, flag 'redirected'           → clear (null)
  - flag set to anything else                → never touched (a manual
    exclusion; d7_mark_redirects_bulk.py:65-72 ``skip_redirect``)
  - probe exception                          → treated as not-redirected
    (d7_mark_redirects_bulk.py:31-39)

Spark shape: the bulk/pool machinery collapses into partitioning — the
candidate set repartitions into ceil(n / bulk_size) partitions (O6) and
the probe is one Arrow-batched ``mapInPandas`` stage (same Transport
seam as sources/acquire.fetch_docs). The update-only RabbitMQ doc
becomes a column-level merge back into the table: only
``exclude_from_globalsearch`` changes, only for probed ids.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eea_crawler_spark.sinks import lakehouse as LK
from eea_crawler_spark.sources.acquire import Transport

PUBLICATIONS_PREFIX = "https://www.eea.europa.eu/publications"
BULK_SIZE = 10_000  # d6_mark_redirects.py default bulk_size
REDIRECTED = "redirected"

PROBED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("redirected", T.BooleanType()),
    ]
)


def redirect_candidates(
    searchui: DataFrame,
    prefix: str = PUBLICATIONS_PREFIX,
    flag_col: str = "exclude_from_globalsearch",
) -> DataFrame:
    """Prefix-filtered (id, stored flag) candidate set
    (d6_mark_redirects.py:24-25). Column-pruned before the probe so the
    scan ships two columns, not the whole searchui row."""
    flag = (
        F.col(flag_col).cast("string")
        if flag_col in searchui.columns
        else F.lit(None).cast("string")
    )
    return (
        searchui.filter(F.col("id").startswith(prefix))
        .select("id", flag.alias("stored_flag"))
    )


def probe_redirects(
    candidates: DataFrame,
    transport: Transport,
    bulk_size: int = BULK_SIZE,
) -> DataFrame:
    """HEAD-probe stage: ``transport(url) -> (status, body)``; any 3xx
    status is a redirect, exceptions count as not-redirected
    (url_redirects, d7_mark_redirects_bulk.py:31-39). Partitioned into
    ceil(n / bulk_size) tasks — the d6 bulk split re-expressed."""
    n = candidates.count()
    parts = max(1, math.ceil(n / bulk_size))

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "redirected": []}
            for url in pdf["id"]:
                try:
                    status, _body = transport(url)
                    redirected = 300 <= status < 400
                except Exception:  # noqa: BLE001 — reference: probe failure = no
                    redirected = False
                out["id"].append(url)
                out["redirected"].append(redirected)
            yield pd.DataFrame(out)

    return (
        candidates.select("id")
        .repartition(parts)
        .mapInPandas(_probe, schema=PROBED_SCHEMA)
    )


def redirect_updates(candidates: DataFrame, probed: DataFrame) -> DataFrame:
    """Update-only docs where the probe disagrees with the stored flag
    (d7_mark_redirects_bulk.py:52-75): rows (id, new_flag) with
    new_flag = 'redirected' or null. Manual exclusions (stored flag set
    but not 'redirected') are skipped."""
    joined = candidates.join(probed, "id")
    # null flag = not excluded (SQL null-compare would drop those rows)
    already = F.coalesce(F.col("stored_flag") == REDIRECTED, F.lit(False))
    manual = F.col("stored_flag").isNotNull() & ~already
    changed = F.col("redirected") != already
    return (
        joined.filter(~manual & changed)
        .select(
            "id",
            F.when(F.col("redirected"), F.lit(REDIRECTED))
            .otherwise(F.lit(None).cast("string"))
            .alias("new_flag"),
        )
    )


def apply_redirect_updates(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    flag_col: str = "exclude_from_globalsearch",
) -> int:
    """Update-only MERGE twin: build full replacement rows for the
    probed ids (stored row + new flag, every other column and the
    ``indexed_at`` stamp unchanged — the Logstash ``update_only`` leg,
    search_pipeline.conf:19-27 + update_redirect_in_es) and route them
    through the table's own merge path. Format-aware by construction:
    on a MOR table this appends one O(batch) segment instead of the
    round-6 column rewrite, which read only the stale base and then
    rmtree'd the segment log — every un-compacted upsert/tombstone was
    silently discarded (the round-6 ADVICE data-loss finding). Returns
    the number of updated rows."""
    updates = updates.localCheckpoint(eager=True)  # cut lineage pre-merge
    n = updates.count()
    if not n:
        return 0
    table = LK.read_table(spark, table_path)
    upd_rows = (
        table.join(F.broadcast(updates.select("id", "new_flag")), "id")
        .withColumn(flag_col, F.col("new_flag").cast("string"))
        .drop("new_flag")
        .localCheckpoint(eager=True)  # cut lineage to the pre-merge files
    )
    # tie-break order: a MOR table's order column is a per-table
    # invariant (spec.json); otherwise the sync stamp when present, else
    # the key itself — constant within a key, so the merge's
    # updates-win-ties rule applies the new flag either way without
    # touching the stored stamp (flag maintenance is not a reindex).
    if LK.is_mor_table(table_path):
        order_col = LK._mor_spec(table_path)["order_col"]
    elif "indexed_at" in table.columns:
        order_col = "indexed_at"
    else:
        order_col = "id"
    LK.merge_upsert(
        spark, table_path, upd_rows, key="id", order_col=order_col,
        strategy="broadcast",
    )
    return n


def run_redirect_sweep(
    spark: SparkSession,
    searchui_path: str,
    transport: Transport,
    prefix: str = PUBLICATIONS_PREFIX,
    bulk_size: int = BULK_SIZE,
) -> dict[str, int]:
    """The full d6→d7 sweep over a searchui table. Returns counts for
    the status stream."""
    # LK.read_table, not read.parquet: on a MOR table the plain scan
    # sees only the stale base — un-compacted upserts would be probed
    # with stale flags and deletions resurrected as candidates
    searchui = LK.read_table(spark, searchui_path)
    candidates = redirect_candidates(searchui, prefix).localCheckpoint(eager=True)
    probed = probe_redirects(candidates, transport, bulk_size)
    updates = redirect_updates(candidates, probed)
    n_upd = apply_redirect_updates(spark, searchui_path, updates)
    return {"candidates": candidates.count(), "updated": n_upd}
