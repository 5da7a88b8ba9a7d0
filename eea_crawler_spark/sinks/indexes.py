"""Index sinks: upsert/delete lifecycle, backups, status stream.

The reference's sink chain is RabbitMQ → Logstash → Elasticsearch
upsert by doc id (``logstash/pipeline/search_pipeline.conf:12-29``),
with index lifecycle managed in ``dags/lib/elastic.py``: idempotent
create (:107-119), clone-based backups keeping the last 3 (:75-104,
184-209), and per-run status events (``dags/lib/status.py:115-163``).

Spark-first translation: the system of record is a parquet/Delta table
written with a keyed last-wins MERGE (streaming.pipeline.state_merge);
Elasticsearch remains a disposable *serving* copy written through the
es-hadoop connector — ``es_write_options`` builds the exact connector
config, import-gated since the connector jar is not in this
environment. Backups become directory snapshots with keep-N retention
(Delta time travel + VACUUM is the lakehouse twin).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


BACKUP_KEEP = 3  # dags/lib/elastic.py:98-104


def upsert_index(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "indexed_at",
    strategy: str = "window",
    backend: str = "auto",
    n_buckets: int | None = None,
    batch_rows: int | None = None,
    unique_keys: bool = False,
) -> None:
    """S11/O4: keyed last-wins upsert into the canonical table.
    ``strategy="broadcast"`` = the small-batch zero-state-shuffle merge
    plan; ``backend`` routes the table format (delta / mor / parquet),
    ``n_buckets`` buckets a newly-created mor table on its key,
    ``unique_keys`` = caller contract that the batch has one row per
    key (skips the within-batch dedup shuffle) —
    see sinks.lakehouse.merge_upsert."""
    from eea_crawler_spark.sinks.lakehouse import merge_upsert

    merge_upsert(
        spark, table_path, updates, key=key, order_col=order_col,
        strategy=strategy, backend=backend, n_buckets=n_buckets,
        batch_rows=batch_rows, unique_keys=unique_keys,
    )


def delete_from_index(
    spark: SparkSession,
    table_path: str,
    doomed: DataFrame,
    key: str = "id",
    backend: str = "auto",
) -> None:
    """S14: DELETE WHERE id IN (…) — Delta ``WHEN MATCHED DELETE`` on a
    lakehouse runtime, a tombstone segment on mor, anti-join rewrite +
    swap on parquet."""
    from eea_crawler_spark.sinks.lakehouse import merge_delete

    merge_delete(spark, table_path, doomed, key=key, backend=backend)


def replace_table(df: DataFrame, table_path: str) -> None:
    """Overwrite a table the df may itself be reading from: write beside,
    then swap (the read-vs-overwrite hazard Delta handles via the log)."""
    tmp = f"{table_path}__next"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    os.rename(tmp, table_path)
    spark = df.sparkSession
    spark.catalog.refreshByPath(table_path)
    spark.catalog.refreshByPath(tmp)


def backup_index(table_path: str, backups_root: str, keep: int = BACKUP_KEEP) -> str:
    """S13/O2: snapshot the table dir as ``updated_at_<ms>``, keep the
    newest ``keep`` snapshots (sort by name desc ≡ creation desc, the
    retention top-k of elastic.py:188-209)."""
    os.makedirs(backups_root, exist_ok=True)
    # ns resolution: two snapshots in the same millisecond must not collide
    stamp = f"updated_at_{time.time_ns()}"
    dst = os.path.join(backups_root, stamp)
    shutil.copytree(table_path, dst)
    snaps = sorted(
        (d for d in os.listdir(backups_root) if d.startswith("updated_at_")),
        reverse=True,
    )
    for stale in snaps[keep:]:
        shutil.rmtree(os.path.join(backups_root, stale))
    return dst


def status_event(
    spark: SparkSession,
    status_path: str,
    task_name: str,
    status: str,
    msg: str = "",
    docs_cnt: int | None = None,
) -> None:
    """A2/status stream: append one event row (status.py:115-163 shape:
    epoch-ms timestamps, docs_cnt)."""
    row = [
        (
            task_name,
            status,
            msg,
            int(time.time() * 1000),
            docs_cnt,
        )
    ]
    df = spark.createDataFrame(
        row, "task_name string, status string, msg string, start_time_ts long, docs_cnt long"
    )
    # no coalesce(1): a one-row local relation already writes one file,
    # and Repartition on top of a Python-built LocalRelation blocks the
    # LocalTableScan conversion — the write then routes through a
    # Python-RDD scan costing ~3.5 s per event (measured; plain write
    # of the same row is 0.4 s)
    df.write.mode("append").parquet(status_path)


def es_write_options(
    index: str,
    nodes: str = "localhost:9200",
    upsert: bool = True,
    id_col: str = "id",
) -> dict[str, str]:
    """Connector options for the Elasticsearch serving copy
    (search_pipeline.conf semantics: document_id=%{id}, doc_as_upsert).

    Usage (requires the es-hadoop / elasticsearch-spark jar, not
    present in this environment):

        df.write.format("org.elasticsearch.spark.sql")
          .options(**es_write_options("data_searchui"))
          .mode("append").save()
    """
    opts = {
        "es.nodes": nodes,
        "es.resource": index,
        "es.mapping.id": id_col,
        "es.batch.size.entries": "500",  # scroll/bulk batch, elastic.py:123-129
    }
    if upsert:
        opts["es.write.operation"] = "upsert"
    return opts


def es_write(df: DataFrame, index: str, **kw) -> None:
    """S11 serving write — import-gated on the connector jar."""
    try:
        (
            df.write.format("org.elasticsearch.spark.sql")
            .options(**es_write_options(index, **kw))
            .mode("append")
            .save()
        )
    except Exception as ex:  # pragma: no cover - connector not shipped here
        raise NotImplementedError(
            "elasticsearch-spark connector jar not available in this "
            "environment; use es_write_options() with a cluster that has it"
        ) from ex


# ---- bucketed state tables (co-located id joins) ------------------------


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "id",
    n_buckets: int = 64,
) -> None:
    """Persist a state table bucketed + sorted by its join key.

    The sync engine joins raw/searchui/quarantine state on ``id`` every
    run (J1 diff, J2 deletes, O4 merge). Plain parquet pays a full
    shuffle of both sides per run; bucketing pre-partitions the data on
    disk so Catalyst plans those joins with **zero Exchange** (pinned
    in tests) — at 100 TB that is the difference between re-shuffling
    the corpus daily and touching only changed partitions. External
    table: data lives at ``path``, metadata in the session catalog.
    ``n_buckets`` should be sized like shuffle partitions (~64 MB each)
    and MUST match across tables that join co-located.
    """
    (
        # repartition on the bucket key first: each write task then
        # holds exactly one bucket's rows (repartition and bucketBy use
        # the same murmur3 hash), so every bucket is ONE sorted file —
        # the layout Spark requires to trust bucket sortedness at scan
        # time (multi-file buckets silently re-sort in every SMJ,
        # SPARK-24528), and the difference between a sort-free merge
        # join and re-sorting the corpus on every state join.
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed state table (bucket metadata only survives the
    catalog route — ``spark.read.parquet(path)`` would forget it)."""
    return spark.table(table)
