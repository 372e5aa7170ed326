"""inxs_spark — a PySpark-native rule-based main-content extraction
engine with the declarative transform model of funkyfuture/inxs.

Layers:
- :mod:`inxs_spark.kernel`    — pure-Python rules kernel (reference
  semantics; parity oracle)
- :mod:`inxs_spark.extract`   — text+span extraction presets
- :mod:`inxs_spark.plans`     — Spark pipelines (salted repartition →
  sortWithinPartitions → mapInArrow kernel executor)
- :mod:`inxs_spark.sources`   — table I/O seam (parquet now, Iceberg
  via config in production) + deterministic transcript synthesis
- :mod:`inxs_spark.operators` — training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
