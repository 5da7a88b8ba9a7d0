from eea_crawler_spark.operators import dedup, similarity

__all__ = ["dedup", "similarity"]
