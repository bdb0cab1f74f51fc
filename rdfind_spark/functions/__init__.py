"""Beyond-reference operators for large-scale training-data pipelines:
text analysis, deduplication, similarity search, event analytics,
multimodal plumbing.  Each operator ships a Spark DataFrame builder and
a DuckDB-SQL rendering driven by the same constants, so the driver's
oracle genuinely checks the Spark execution."""
