"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join revenue query (SURVEY.md
§2.9 Q7, TPC-H Q5 shape) over /root/testdata/sf0.001.

``queries()`` maps every implemented operator from SURVEY.md §2 to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` carries the
DuckDB-equivalent ANSI SQL for the hash-compare gate. Every query
inside the gate's 50-slot
window has an oracle — MinHash's slot holds its containment invariant
(``dedup_minhash_contained``: verified pairs ⊆ exact n-gram pairs,
hash-checked as an empty set); the raw banded MinHash output rides
51st (rows-only by design, xxhash64 signatures have no SQL twin;
bit-identity and recall pinned in pytest), and the two incremental
delta-vs-corpus queries (``dedup_ngram_delta``, ``emb_neardup_delta``)
ride 52nd/53rd WITH full oracles stating the restriction contract, and
the cluster-resolution pair (``dedup_clusters``, ``dedup_canonical`` —
connected components over the near-dup pairs + the keep/drop verdict)
rides 54th/55th with recursive-CTE oracles. 55 declared, 54
oracle-bearing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eea_crawler_spark.plans import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q7"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
