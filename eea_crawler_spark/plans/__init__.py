from eea_crawler_spark.plans.queries import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
