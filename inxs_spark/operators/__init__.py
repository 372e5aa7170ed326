"""Training-data pipeline operators (brief: first-class alongside the
extraction engine): deduplication, similarity search, text analysis,
multimodal column plumbing. All operators are DataFrame → DataFrame,
JVM-side (built-in pyspark.sql.functions) unless semantics genuinely
need a vectorized Pandas UDF."""
