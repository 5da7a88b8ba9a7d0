from eea_crawler_spark.functions import text, vectors

__all__ = ["text", "vectors"]
