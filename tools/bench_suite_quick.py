"""Quick headline-suite timing mimic of bench.py (same queries, same
min-of-3 interleaved warm reps, noop sink) WITHOUT the scaling block —
for fast optimization iteration. bench.py itself stays frozen.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))


def main() -> None:
    import __spark_entry__ as entry
    from inxs_spark.sources.session import get_spark
    from inxs_spark.sources.transcripts import ensure_transcripts, tier_for_sf_dir
    from pyspark.sql import functions as F

    from inxs_spark.plans.extract_pipeline import extract_df

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-quick",
                      shuffle_partitions=max(CPUS * 2, 16))
    tier = tier_for_sf_dir(SF_DIR)
    tpath = ensure_transcripts(spark, tier)
    tdf = spark.read.parquet(tpath)
    n_turns = tdf.count()

    def timed_extraction():
        t0 = time.monotonic()
        extract_df(spark.read.parquet(tpath)).agg(F.count("*")).collect()
        return time.monotonic() - t0

    timed_extraction()  # warm
    ex_walls = [round(timed_extraction(), 3) for _ in range(REPS)]

    qs = {**entry.queries(), **entry.extra_queries()}
    suite = [
        ("q1_pricing_summary", "q1_pricing_summary"),
        ("q_regional_revenue", "q_regional_revenue"),
        ("q_latest_order_per_customer", "q_latest_order"),
        ("x_minhash_dup_pairs", "dd_minhash"),
        ("q_cosine_topk", "sim_cosine_topk"),
        ("q_boilerplate_lines", "tx_boilerplate"),
        ("q_containment_pairs", "tx_containment"),
    ]
    for name, _k in suite:
        try:
            wdf = qs[name](spark, "/root/testdata/sf0.001")
            wdf.write.format("noop").mode("overwrite").save()
            for attr in ("_blacklist_cache", "_candidate_pairs_cache"):
                c = getattr(wdf, attr, None)
                if c is not None:
                    c.unpersist()
        except Exception as e:
            print("warm fail", name, e, flush=True)
    walls: dict[str, list[float]] = {k: [] for _n, k in suite}
    for _rep in range(REPS):
        for name, key in suite:
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls[key].append(round(time.monotonic() - t0, 3))
            for attr in ("_blacklist_cache", "_candidate_pairs_cache"):
                c = getattr(df, attr, None)
                if c is not None:
                    c.unpersist()
    results = {"ex_extract": min(ex_walls)}
    for _name, key in suite:
        results[key] = min(walls[key])
    headline = ["ex_extract", "q1_pricing_summary", "q_regional_revenue",
                "q_latest_order", "dd_minhash", "sim_cosine_topk"]
    total = round(sum(results[k] for k in headline), 3)
    print(json.dumps({
        "value": total, "queries": results, "sf": SF_DIR,
        "extract_turns": n_turns,
        "turns_per_s": round(n_turns / results["ex_extract"], 1),
        "all_walls": {**walls, "ex_extract": ex_walls},
        "loadavg": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
