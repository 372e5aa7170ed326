"""spark-submit job entry points."""
