from eea_crawler_spark.plans.extras import EXTRA_ORACLE, EXTRA_QUERIES
from eea_crawler_spark.plans.queries import ORACLE as CORE_ORACLE
from eea_crawler_spark.plans.queries import QUERIES as CORE_QUERIES

QUERIES = {**CORE_QUERIES, **EXTRA_QUERIES}
ORACLE = {**CORE_ORACLE, **EXTRA_ORACLE}

__all__ = ["QUERIES", "ORACLE", "CORE_QUERIES", "CORE_ORACLE", "EXTRA_QUERIES", "EXTRA_ORACLE"]
