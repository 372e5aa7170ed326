"""One-off stress probe (VERDICT round-2 task 9): do the
literal-tree embedding expressions (bucket_key: n_planes x dim scalar
literals; _cell_expr: n_cells x dim) survive production dim 768, or do
planning/codegen costs force the vectorized-matmul pandas UDF path
(the MinHash precedent)? Prints wall times; results recorded in
PLANS.md.

Usage: python tools/stress_dim768.py [n_rows] [dim] [n_planes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 768
PLANES = int(sys.argv[3]) if len(sys.argv) > 3 else 24


def main() -> None:
    import numpy as np

    from pyspark.sql import functions as F

    from inxs_spark.operators.similarity import (
        _cell_expr,
        _cell_udf,
        bucket_key,
        bucket_key_udf,
        hyperplanes,
    )
    from inxs_spark.sources.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    # deterministic synthetic embeddings, built JVM-side (no driver ship)
    df = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), "
            "j -> cast(pmod(xxhash64(id, j), 1000) as double) / 500.0 - 1.0)"
        ).alias("embedding"),
    ).localCheckpoint()  # materialize input so probes time ONLY the op

    planes = hyperplanes(DIM, PLANES, seed=42)
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((16, DIM))

    def probe(tag, col_fn):
        t_plan0 = time.monotonic()
        out = df.select(col_fn().alias("k"))
        out.explain(mode="simple")  # forces analysis+planning
        t_plan = time.monotonic() - t_plan0
        t0 = time.monotonic()
        out.agg(F.sum(F.hash("k"))).collect()
        wall = time.monotonic() - t0
        print(f"{tag}: plan={t_plan:.2f}s exec={wall:.2f}s "
              f"({N / wall:,.0f} rows/s)")
        return wall

    lit_b = probe("bucket_key literal-tree", lambda: bucket_key("embedding", planes))
    udf_b = probe("bucket_key pandas-udf  ", lambda: bucket_key_udf("embedding", planes))
    lit_c = probe("ivf_assign literal-tree", lambda: _cell_expr("embedding", cents))
    udf_c = probe("ivf_assign pandas-udf  ",
                  lambda: _cell_udf(cents)(F.col("embedding")))
    print(f"speedup bucket_key: {lit_b / udf_b:.1f}x; ivf: {lit_c / udf_c:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
