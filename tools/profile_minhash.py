"""Stage-by-stage profile of the dd_minhash bench query (guide §1.1/§1.4).

Times each stage of minhash_dedup_pairs at $SPARK_GRAFT_SF_DIR with the
noop sink so the computation, not the sink, is measured.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from inxs_spark.sources.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="profile-minhash",
                      shuffle_partitions=max(CPUS * 2, 16))
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    from inxs_spark.operators.dedup import (
        jaccard_verify,
        minhash_band_memberships,
        minhash_lsh_candidates,
        shingles,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = docs.count()
    print(f"docs rows = {n}", flush=True)
    avg_len = docs.agg(F.avg(F.length("text"))).collect()[0][0]
    print(f"avg text len = {avg_len:.0f}", flush=True)

    # warm python workers
    sc.setJobDescription("warm")
    noop(minhash_band_memberships(docs, num_perm=32, bands=8).limit(10))

    for rep in range(2):
        t0 = time.monotonic()
        sc.setJobDescription("memberships")
        mem = minhash_band_memberships(docs, num_perm=32, bands=8)
        noop(mem)
        t1 = time.monotonic()
        print(f"[rep{rep}] memberships (sig UDF + band explode): {t1-t0:.2f}s", flush=True)

        sc.setJobDescription("candidates")
        cands = minhash_lsh_candidates(docs, num_perm=32, bands=8)
        noop(cands)
        t2 = time.monotonic()
        print(f"[rep{rep}] candidates (memberships + cap + pairs): {t2-t1:.2f}s", flush=True)
        ncands = cands.count()
        t2b = time.monotonic()
        print(f"[rep{rep}] n candidate pairs = {ncands} (count {t2b-t2:.2f}s)", flush=True)

        sc.setJobDescription("shingle corpus once")
        noop(docs.select(shingles("text", 3, "word").alias("sh")))
        t3 = time.monotonic()
        print(f"[rep{rep}] one corpus shingle pass (JVM HOF): {t3-t2b:.2f}s", flush=True)

        sc.setJobDescription("full verify (lazy)")
        cands2 = minhash_lsh_candidates(docs, num_perm=32, bands=8)
        out = jaccard_verify(docs, cands2, threshold=0.5)
        noop(out.orderBy("id_a", "id_b"))
        t4 = time.monotonic()
        print(f"[rep{rep}] FULL pipeline (cands + lazy verify + orderBy): {t4-t3:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
