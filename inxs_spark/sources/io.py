"""Table I/O seam — ALL table reads/writes go through here.

In this sandbox tables are Parquet; in production the same calls target
Iceberg (``format("iceberg")`` + snapshot pinning) — the seam keeps
that a config switch (SURVEY.md §0 environment constraints; no Iceberg
jars locally). ``input_fingerprint`` stands in for the Iceberg snapshot
id in lineage rows (BASELINE.json:6): a hash over the input files'
(path, size, mtime) — stable for an immutable input.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("INXS_SPARK_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, location: str, fmt: str | None = None,
               snapshot_id: str | None = None) -> DataFrame:
    fmt = fmt or TABLE_FORMAT
    reader = spark.read.format(fmt)
    if snapshot_id is not None and fmt == "iceberg":
        reader = reader.option("snapshot-id", snapshot_id)
    return reader.load(location)


def write_table(df: DataFrame, location: str, fmt: str | None = None,
                mode: str = "overwrite") -> None:
    (df.write.format(fmt or TABLE_FORMAT).mode(mode).save(location))


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   fmt: str | None = None) -> None:
    """Persist a table BUCKETED by the join/aggregation key — the
    co-located-join layout. Two tables bucketed the same way join with
    ZERO Exchange on either side (asserted in
    tests/test_stateful_and_io.py): at 100 TB this converts every
    recurring fact-fact join from a full shuffle into a local
    merge-per-bucket. Parquet+bucketBy here; on Iceberg the same call
    becomes a ``bucket(n, col)`` partition transform."""
    writer = df.write.format(fmt or TABLE_FORMAT).mode("overwrite")
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def input_fingerprint(location: str) -> str:
    """Deterministic fingerprint of an on-disk input table — the
    sandbox stand-in for an Iceberg snapshot id."""
    entries = []
    if os.path.isdir(location):
        for dirpath, _dirnames, filenames in os.walk(location):
            for name in sorted(filenames):
                if name.startswith(("_", ".")):
                    continue
                full = os.path.join(dirpath, name)
                stat = os.stat(full)
                entries.append(f"{os.path.relpath(full, location)}:{stat.st_size}")
    elif os.path.exists(location):
        stat = os.stat(location)
        entries.append(f"{os.path.basename(location)}:{stat.st_size}")
    digest = hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()
    return f"files-{digest[:24]}"
