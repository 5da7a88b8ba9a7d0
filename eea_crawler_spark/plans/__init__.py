from eea_crawler_spark.plans.extras import EXTRA_ORACLE, EXTRA_QUERIES
from eea_crawler_spark.plans.queries import ORACLE as CORE_ORACLE
from eea_crawler_spark.plans.queries import QUERIES as CORE_QUERIES
from eea_crawler_spark.plans.sync import SYNC_ORACLE, SYNC_QUERIES

# The driver's correctness gate hash-checks only the FIRST 50 declared
# queries, so ordering is a coverage decision. Round-12 rotation
# (continuing rounds 10–11): the newest oracle-bearing query
# (ann_ivf_repair — the persisted IVF index's partition-local
# update-in-place repair, probe-all vs brute force over the corrected
# corpus) rides inside the window; q15 (simple groupBy-HAVING — the
# A-family stays gated via q11/q13/q14/q27/q28) joins the long-stable
# scalar queries (q1–q5, q16) at the tail alongside the by-design
# rows-only dedup_minhash_lsh. The rotated-out eight lose nothing:
# pytest (test_queries_oracle / test_extras_oracle) runs the identical
# oracle compare for ALL declared queries every session, and
# scripts/driver_canon_check.py covers the full set against DuckDB.
_TAIL = [
    "q1", "q2", "q3", "q4", "q5", "q15", "q16", "dedup_minhash_lsh",
]

_ALL_QUERIES = {**CORE_QUERIES, **SYNC_QUERIES, **EXTRA_QUERIES}
QUERIES = {n: q for n, q in _ALL_QUERIES.items() if n not in _TAIL}
QUERIES.update({n: _ALL_QUERIES[n] for n in _TAIL})
ORACLE = {**CORE_ORACLE, **SYNC_ORACLE, **EXTRA_ORACLE}

__all__ = [
    "QUERIES",
    "ORACLE",
    "CORE_QUERIES",
    "CORE_ORACLE",
    "EXTRA_QUERIES",
    "EXTRA_ORACLE",
    "SYNC_QUERIES",
    "SYNC_ORACLE",
]
