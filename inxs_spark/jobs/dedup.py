"""Standalone dedup job: the spark-submit entry point for running ONE
dedup method over a document corpus and shipping survivors + evidence.

    python -m inxs_spark.jobs.dedup --input docs.parquet --out /out \
        --method minhash --threshold 0.85

Methods (each one of the repo's tested operators):

- ``exact``    — byte-identical (normalized optional) md5 dedup
- ``minhash``  — MinHash+LSH candidates → exact-Jaccard verify →
                 connected components → keep min id per cluster
- ``simhash``  — Manku combined-block SimHash pairs at --max-hamming →
                 connected components → keep min id per cluster

Outputs under ``--out``:

    survivors/        parquet of surviving rows (original columns)
    pairs/            parquet of the evidence pairs (near-dup methods)
    metrics/ + metrics_table/   attrition lineage rows (same queryable
                      shape as curate()/the extraction runner)

The job prints ONE JSON line with the stage counts, mirroring the
other jobs' contract. All scale behavior is the operators' own
(digest shuffles, banded LSH with capped hot buckets, candidate-pruned
verify, O(log d) connected components).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def dedup_job(
    df: DataFrame,
    out_root: str,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.85,
    max_hamming: int = 3,
    normalize: bool = True,
    run_id: str | None = None,
) -> dict:
    """Run one dedup method end-to-end; returns the stats dict (also
    written to the metrics table and printed by main())."""
    from pyspark import StorageLevel

    from ..operators.dedup import (
        dedup_keep_one_per_cluster,
        exact_dedup,
        minhash_dedup_pairs,
        simhash_dup_pairs,
    )
    from ..operators.text import normalize_expr
    from .curate import write_curate_metrics

    if method not in ("exact", "minhash", "simhash"):
        raise ValueError(f"unknown method {method!r}")
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.monotonic()
    walls: dict[str, float] = {}

    dd_col = text_col
    if normalize:
        dd_col = "__norm_text"
        while dd_col in df.columns:
            dd_col = "_" + dd_col
        df = df.withColumn(dd_col, normalize_expr(text_col))

    # single input scan, same staged-cache discipline as curate()
    caller_cached = df.storageLevel.useMemory or df.storageLevel.useDisk
    c0 = df if caller_cached else df.persist(StorageLevel.MEMORY_AND_DISK)
    stats = {"input": c0.count()}
    walls["input"] = time.monotonic() - t0

    t = time.monotonic()
    pairs = None
    if method == "exact":
        survivors = exact_dedup(c0, id_col, dd_col)
    else:
        if method == "minhash":
            pairs = minhash_dedup_pairs(
                c0, id_col=id_col, text_col=dd_col, threshold=threshold,
                prune_verify=True,
            )
        else:  # simhash
            pairs = simhash_dup_pairs(
                c0, id_col=id_col, text_col=dd_col, max_hamming=max_hamming
            )
        # write the evidence pairs ONCE, then cluster from the written
        # parquet — re-deriving the pairs for connected components
        # would execute the verify joins a second time (round-4
        # review); the same read-back pattern the survivors count uses
        pairs.write.mode("overwrite").parquet(os.path.join(out_root, "pairs"))
        cache = getattr(pairs, "_candidate_pairs_cache", None)
        if cache is not None:
            cache.unpersist()
        pairs_read = df.sparkSession.read.parquet(
            os.path.join(out_root, "pairs")
        )
        survivors = dedup_keep_one_per_cluster(c0, pairs_read, id_col)
    if normalize:
        survivors = survivors.drop(dd_col)

    survivors.write.mode("overwrite").parquet(
        os.path.join(out_root, "survivors")
    )
    out = df.sparkSession.read.parquet(os.path.join(out_root, "survivors"))
    stats["output"] = out.count()
    walls["output"] = time.monotonic() - t
    if not caller_cached:
        c0.unpersist()
    write_curate_metrics(
        df.sparkSession, out_root, stats, walls,
        run_id=run_id, op=f"dedup_{method}",
    )
    return stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.dedup")
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--out", required=True)
    parser.add_argument("--method", default="minhash",
                        choices=("exact", "minhash", "simhash"))
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--threshold", type=float, default=0.85,
                        help="minhash exact-Jaccard verify threshold")
    parser.add_argument("--max-hamming", type=int, default=3,
                        help="simhash hamming radius")
    parser.add_argument("--no-normalize", action="store_true",
                        help="dedup raw bytes instead of canonicalized text")
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(master=args.master, app_name="inxs_spark-dedup")
    try:
        df = spark.read.parquet(args.input)
        stats = dedup_job(
            df, args.out, method=args.method,
            id_col=args.id_col, text_col=args.text_col,
            threshold=args.threshold, max_hamming=args.max_hamming,
            normalize=not args.no_normalize,
        )
        print(json.dumps({
            "output_path": os.path.join(args.out, "survivors"),
            "method": args.method, **stats,
        }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
