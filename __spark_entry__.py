"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join revenue query (SURVEY.md
§2.9 Q7, TPC-H Q5 shape) over /root/testdata/sf0.001.

``queries()`` maps every implemented operator from SURVEY.md §2 to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` carries the
DuckDB-equivalent ANSI SQL for the hash-compare gate. 58 declared, 57
oracle-bearing. Round-12 window rotation (see plans/__init__.py): the
gate's 50-slot window holds only oracle-bearing queries — including
the incremental delta-vs-corpus pair
(``dedup_ngram_delta``/``emb_neardup_delta``, restriction-contract
oracles), the cluster-resolution pair
(``dedup_clusters``/``dedup_canonical``, recursive-CTE closure), the
O(delta) cluster fold ``dedup_cluster_incr`` (oracle = the FULL
closure), and the persisted IVF index's lifecycle pair
(``ann_ivf_state`` build→append→serve and ``ann_ivf_repair``
…→partition-local update-in-place repair, each hash-checked against
exact brute-force cosine SQL — the repair's over the corrected corpus
stated in the oracle itself). The tail (51st–58th) holds seven
long-stable scalar/aggregate queries (q1–q5 q15 q16 — still
oracle-compared by pytest every session) and the by-design rows-only
``dedup_minhash_lsh`` (its gated slot is the containment invariant
``dedup_minhash_contained``).
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
