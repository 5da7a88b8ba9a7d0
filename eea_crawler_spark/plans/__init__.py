from eea_crawler_spark.plans.extras import EXTRA_ORACLE, EXTRA_QUERIES
from eea_crawler_spark.plans.queries import ORACLE as CORE_ORACLE
from eea_crawler_spark.plans.queries import QUERIES as CORE_QUERIES
from eea_crawler_spark.plans.sync import SYNC_ORACLE, SYNC_QUERIES

# Order: core (all oracled) → sync (all oracled) → extras (oracle-bearing
# first, rows-only tail). The driver's correctness gate evaluated only the
# first 50 declared queries in round 1, so the tail is reserved for the
# rows-only operators whose stronger checks live in pytest anyway.
QUERIES = {**CORE_QUERIES, **SYNC_QUERIES, **EXTRA_QUERIES}
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
