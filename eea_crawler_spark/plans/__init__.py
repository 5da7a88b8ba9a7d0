from eea_crawler_spark.plans.extras import EXTRA_ORACLE, EXTRA_QUERIES
from eea_crawler_spark.plans.queries import ORACLE as CORE_ORACLE
from eea_crawler_spark.plans.queries import QUERIES as CORE_QUERIES
from eea_crawler_spark.plans.sync import SYNC_ORACLE, SYNC_QUERIES

QUERIES = {**CORE_QUERIES, **EXTRA_QUERIES, **SYNC_QUERIES}
ORACLE = {**CORE_ORACLE, **EXTRA_ORACLE, **SYNC_ORACLE}

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
