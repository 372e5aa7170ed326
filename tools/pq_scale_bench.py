"""ANN serving-path scale bench: brute-force cosine vs PQ-ADC vs
IVF-PQ on a ~1M-vector corpus (the sf0.001 embeddings table replicated
with re-keyed ids — same cluster structure, 2048x the rows).

What it evidences for the 100 TB story: the three serving shapes read
very different byte volumes for the same query —

  brute    : every row's 64-double embedding      (the correctness baseline)
  pq_topk  : every row's 8-int code               (~3% of the bytes)
  ivfpq    : nprobe/n_cells of the rows' codes    (both pruning axes)

Usage:  python tools/pq_scale_bench.py [replicas] [master]
Prints one JSON line with min-of-3 walls per path plus the index
build walls; intended for a loadavg-quiet window (records loadavg).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from inxs_spark.operators.similarity import (
        cosine_topk,
        ivf_train_centroids,
        ivfpq_topk,
        ivfpq_write_index,
        pq_topk_indexed,
        pq_train_codebooks,
        pq_write_index,
    )
    from inxs_spark.sources.session import get_spark

    spark = get_spark(master=master, app_name="pq-scale-bench")
    work = "/tmp/pq_scale_bench"
    shutil.rmtree(work, ignore_errors=True)

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n_base = base.count()
    dim = len(base.select("embedding").first()[0])

    # replicate with re-keyed ids; tiny per-replica perturbation keeps
    # rows distinct without moving them across clusters
    corpus = (
        base.crossJoin(spark.range(replicas).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x * (1.0 + F.col("rep").cast("double") * 1e-7),
            ).alias("embedding"),
        )
    )
    vec_path = os.path.join(work, "vectors")
    t = time.time()
    corpus.write.parquet(vec_path)
    build_vectors_s = round(time.time() - t, 2)
    vectors = spark.read.parquet(vec_path)
    n = vectors.count()

    qvec = [float(x) for x in base.filter(F.col("vec_id") == 0).first().embedding]

    t = time.time()
    books = pq_train_codebooks(vectors, dim=dim, m=8, k=16)
    cents = ivf_train_centroids(vectors, dim, n_cells=16)
    train_s = round(time.time() - t, 2)

    pq_path = os.path.join(work, "pq")
    t = time.time()
    pq_write_index(vectors, books, pq_path)
    build_pq_s = round(time.time() - t, 2)

    ivfpq_path = os.path.join(work, "ivfpq")
    t = time.time()
    ivfpq_write_index(vectors, cents, books, ivfpq_path)
    build_ivfpq_s = round(time.time() - t, 2)

    def best_of(fn, reps=3):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn().collect()
            walls.append(round(time.time() - t0, 3))
        return walls

    runs = {
        "brute_cosine": best_of(lambda: cosine_topk(vectors, qvec, k=10)),
        "pq_adc": best_of(lambda: pq_topk_indexed(spark, pq_path, qvec, k=10)),
        "ivfpq_nprobe4": best_of(
            lambda: ivfpq_topk(spark, ivfpq_path, qvec, k=10, nprobe=4)
        ),
        "ivfpq_rerank": best_of(
            lambda: ivfpq_topk(
                spark, ivfpq_path, qvec, k=10, nprobe=4, rerank_df=vectors
            )
        ),
    }

    # recall of each approximate path vs the exact top-10
    exact = [r.vec_id for r in cosine_topk(vectors, qvec, k=10).collect()]
    recall = {}
    for name, fn in [
        ("pq_adc", lambda: pq_topk_indexed(spark, pq_path, qvec, k=10)),
        ("ivfpq_nprobe4",
         lambda: ivfpq_topk(spark, ivfpq_path, qvec, k=10, nprobe=4)),
        ("ivfpq_rerank",
         lambda: ivfpq_topk(spark, ivfpq_path, qvec, k=10, nprobe=4,
                            rerank_df=vectors)),
    ]:
        got = [r.vec_id for r in fn().collect()]
        recall[name] = round(len(set(got) & set(exact)) / len(exact), 3)

    size = {
        name: sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p) for f in fs
        ) // 1024
        for name, p in [("vectors_kib", vec_path), ("pq_kib", pq_path),
                        ("ivfpq_kib", ivfpq_path)]
    }

    print(json.dumps({
        "n_vectors": n,
        "dim": dim,
        "master": master,
        "train_s": train_s,
        "build": {"vectors": build_vectors_s, "pq": build_pq_s,
                  "ivfpq": build_ivfpq_s},
        "query_walls_s": runs,
        "recall_at_10": recall,
        "index_size": size,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
