"""Round-6 optimization experiments at sf1.0 (guide §1.1): time variants
of q_regional_revenue / q_latest_order / q_cosine_topk with the noop sink.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, build):
    walls = []
    for _ in range(REPS):
        t0 = time.monotonic()
        noop(build())
        walls.append(round(time.monotonic() - t0, 3))
    print(f"{name}: min {min(walls)} walls {walls}", flush=True)


def main():
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from inxs_spark.sources.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="exp-r06",
                      shuffle_partitions=max(CPUS * 2, 16))

    def t(name):
        return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))

    # ---- scan floor
    timeit("lineitem_scan_floor", lambda: t("lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"))

    # ---- q_regional_revenue variants
    def rr_current():
        li, orders, cust = t("lineitem"), t("orders"), t("customer")
        nation, region = F.broadcast(t("nation")), F.broadcast(t("region"))
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy("r_name")
        )

    def rr_premap(hint):
        li, orders, cust = t("lineitem"), t("orders"), t("customer")
        nation, region = F.broadcast(t("nation")), F.broadcast(t("region"))
        omap = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .select("o_orderkey", "r_name")
        )
        if hint:
            omap = F.broadcast(omap)
        return (
            li.join(omap, li.l_orderkey == omap.o_orderkey)
            .groupBy("r_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy("r_name")
        )

    timeit("rr_current", rr_current)
    timeit("rr_premap_hint", lambda: rr_premap(True))
    timeit("rr_premap_nohint", lambda: rr_premap(False))

    # ---- q_latest_order variants
    def lo_window():
        orders = t("orders")
        w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        return (
            orders.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
            .select("o_custkey", F.col("o_orderkey").alias("latest_orderkey"),
                    F.round("o_totalprice", 2).alias("latest_totalprice"))
            .orderBy("o_custkey")
        )

    def lo_maxstruct():
        orders = t("orders")
        s = F.max(F.struct(
            F.col("o_orderdate").alias("d"),
            (-F.col("o_orderkey")).alias("nk"),
            F.col("o_totalprice").alias("p"),
        )).alias("s")
        return (
            orders.groupBy("o_custkey").agg(s)
            .select("o_custkey", (-F.col("s.nk")).alias("latest_orderkey"),
                    F.round("s.p", 2).alias("latest_totalprice"))
            .orderBy("o_custkey")
        )

    timeit("lo_window", lo_window)
    timeit("lo_maxstruct", lo_maxstruct)

    # ---- q_cosine_topk variants
    from inxs_spark.operators.similarity import cosine

    def ct(repart):
        emb = t("embeddings")
        q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
        base = emb.repartition(CPUS) if repart else emb
        return (
            base.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != 0)
            .select("vec_id",
                    F.round(cosine(F.col("embedding").cast("array<double>"),
                                   F.col("q_emb").cast("array<double>")), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(10)
        )

    timeit("cosine_current", lambda: ct(False))
    timeit("cosine_repart", lambda: ct(True))

    spark.stop()


if __name__ == "__main__":
    main()
