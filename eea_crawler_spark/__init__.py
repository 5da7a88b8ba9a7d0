"""eea_crawler_spark — a PySpark-native analytics engine.

Brand-new implementation of the query and data-processing capabilities of
the eea/eea-crawler reference (see SURVEY.md), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, Pandas UDFs only
where built-ins cannot express the semantics.

Layout:
    sources/    table loaders & acquisition-layer scaffolding
    plans/      declared query plans (SURVEY.md §2.9 Q1-Q32 + extras)
    operators/  composite operators (dedup, similarity, incremental state)
    functions/  column-expression helpers (text, arrays, vectors)
    streaming/  Structured Streaming incremental pipelines
"""

__version__ = "0.1.0"
