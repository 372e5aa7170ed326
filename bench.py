"""Benchmark harness (driver contract: prints ONE JSON line).

Headline suite at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

- ex_extract          — flagship: main-content extraction over the
                        bench-tier synthetic transcripts (~600k turns,
                        Zipf conversation skew), salted repartition →
                        sortWithinPartitions → mapInArrow kernel
- q1_pricing_summary  — hash aggregate over lineitem
- q_regional_revenue  — star join with broadcast dims
- q_latest_order      — window function over orders
- dd_minhash          — MinHash+LSH near-dup pairs over documents
- sim_cosine_topk     — brute-force cosine top-k over embeddings

Scaling evidence (north rule: ≥0.8 efficiency N→4N executors; sandbox
stand-in per the driver's instruction — same job at two parallelism
levels): extraction runs at local[4] and local[16] (N=4, 4N=16 — both
within physical cores; the 8→32 pair crosses the SMT boundary where
even raw multiprocessing only reaches ~0.73). This box also has
co-tenant load with >2x run-to-run variance, so each level runs
SPARK_GRAFT_SCALE_REPS (4) interleaved warm reps, each behind a
BOUNDED loadavg precondition (wait up to SPARK_GRAFT_SCALE_LOAD_WAIT_S
for 1-min load < SPARK_GRAFT_SCALE_LOAD_GATE), and the per-level
MINIMUM is used; per-rep loadavg + wait are recorded next to the
walls so a loaded reading is auditable inline. A raw Python-
multiprocessing probe of the same kernel provides the box's own
scaling ceiling for context. Skip with SPARK_GRAFT_SCALING=0.

Two operator-stress rows (line-boilerplate removal, containment
pairs — round-3 sf0.01-only evidence) run at the same sf0.1 tier and
report under operator_stress_walls_s, OUTSIDE the headline total so
`value` stays comparable across rounds. Results append to BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "4"))
# loadavg precondition for scaling reps (round-3 verdict task 5): the
# box carries co-tenant load with >2x run-to-run variance, and the
# driver-visible scaling number landed in loaded windows two rounds
# running while clean-window captures cleared the bar. Before each
# timed rep we wait (bounded) for the 1-min loadavg to fall below the
# gate; per-rep loadavg + wait are recorded next to the walls so a
# loaded reading is visible inline rather than explained after the
# fact. Gate=6 ≈ the level where the round-3 ablations showed walls
# inflating; max wait keeps the whole bench bounded.
SCALE_LOAD_GATE = float(os.environ.get("SPARK_GRAFT_SCALE_LOAD_GATE", "6.0"))
SCALE_LOAD_WAIT_S = int(os.environ.get("SPARK_GRAFT_SCALE_LOAD_WAIT_S", "90"))


def wait_for_quiet(gate: float, max_wait_s: int) -> tuple[float, float]:
    """Block until 1-min loadavg < gate or max_wait_s elapses; returns
    (seconds_waited, loadavg_when_released)."""
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load >= gate and time.monotonic() - t0 < max_wait_s:
        time.sleep(5)
        load = os.getloadavg()[0]
    return round(time.monotonic() - t0, 1), round(load, 2)
# per-query warm reps for the headline suite: the box has documented
# >2x co-tenant variance (BENCH_r02 recorded a 75% dd_minhash
# "regression" that a quiet-box A/B showed was load noise) — min-of-N
# is the noise-robust estimator, same as the scaling walls
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))


def build_session(cores: int):
    from inxs_spark.sources.session import get_spark

    return get_spark(
        master=f"local[{cores}]",
        app_name=f"inxs_spark-bench-{cores}",
        shuffle_partitions=max(cores * 2, 16),
    )


def timed_extraction(spark, path: str) -> float:
    """Times extraction under the SHIPPED default partitioning
    (round-3: one worker wave on ≤2-waves-of-files inputs, the file
    layout beyond — see BASELINE.md re-sweep)."""
    from pyspark.sql import functions as F

    from inxs_spark.plans.extract_pipeline import extract_df

    df = spark.read.parquet(path)
    t0 = time.monotonic()
    extract_df(df).agg(F.count("*")).collect()
    return time.monotonic() - t0


def _mp_worker(args):
    lo, hi, cap = args
    from inxs_spark.extract import extract_turn
    from inxs_spark.sources import synth

    n = 0
    for o in range(lo, hi):
        for t in range(min(synth.conv_length(o), cap)):
            extract_turn(synth.payload(o, t))
            n += 1
    return n


def raw_ceiling(n_low: int, n_high: int) -> dict:
    """Pure-multiprocessing scaling of the SAME kernel — the box's own
    ceiling for the chosen core pair (no Spark in the loop)."""
    import multiprocessing as mp

    out = {}
    for nproc in (n_low, n_high):
        chunks = [(i * 30, (i + 1) * 30, 6) for i in range(nproc)]
        with mp.Pool(nproc) as pool:
            pool.map(_mp_worker, chunks)  # warm imports
            t0 = time.monotonic()
            total = sum(pool.map(_mp_worker, chunks))
            dt = time.monotonic() - t0
        out[nproc] = total / dt
    out["efficiency"] = round(
        (out[n_high] / out[n_low]) / (n_high / n_low), 3
    )
    return out


def main() -> None:
    import __spark_entry__ as entry

    from inxs_spark.sources.transcripts import ensure_transcripts, tier_for_sf_dir

    results: dict[str, float] = {}
    extra: dict = {}
    tier = tier_for_sf_dir(SF_DIR)

    boot = build_session(CPUS)
    tpath = ensure_transcripts(boot, tier)
    n_turns = boot.read.parquet(tpath).count()
    extra["extract_turns"] = n_turns

    # ---- headline suite at full parallelism
    timed_extraction(boot, tpath)  # warm python workers/JIT
    ex_walls = [
        round(timed_extraction(boot, tpath), 3) for _ in range(QUERY_REPS)
    ]
    wall = min(ex_walls)
    results["ex_extract"] = wall
    extra[f"extract_local{CPUS}_turns_per_s"] = round(n_turns / wall, 1)

    qs = {**entry.queries(), **entry.extra_queries()}
    suite = [
        ("q1_pricing_summary", "q1_pricing_summary"),
        ("q_regional_revenue", "q_regional_revenue"),
        ("q_latest_order_per_customer", "q_latest_order"),
        ("x_minhash_dup_pairs", "dd_minhash"),
        ("q_cosine_topk", "sim_cosine_topk"),
    ]
    # bench-tier stress rows for the round-3 sf0.01-only operators
    # (verdict task 9): timed at sf0.1 with the same interleaved
    # min-of-reps, but reported OUTSIDE the headline total so `value`
    # stays comparable across rounds/baseline (plan shape — digests-
    # only exchanges — is pytest-asserted in TestPlanShape)
    stress = [
        ("q_boilerplate_lines", "tx_boilerplate"),
        ("q_containment_pairs", "tx_containment"),
    ]
    suite = suite + stress
    stress_keys = {key for _n, key in stress}
    # warm pass at the tiny tier: spins up pandas-UDF python workers /
    # codegen so the timed numbers measure the queries, not JVM/worker
    # cold start (extraction got its warm-up above)
    for name, _key in suite:
        try:
            wdf = qs[name](boot, "/root/testdata/sf0.001")
            wdf.write.format("noop").mode("overwrite").save()
            wcache = getattr(wdf, "_blacklist_cache", None)
            if wcache is not None:
                wcache.unpersist()
        except Exception:
            pass  # warm-up is best-effort
    # reps are INTERLEAVED across queries (q1,q2,…,q1,q2,…) so a
    # co-tenant load spike lands on one rep of every query instead of
    # every rep of one query; min-of-reps then drops the spiked samples
    rep_walls: dict[str, list[float]] = {key: [] for _name, key in suite}
    for _rep in range(QUERY_REPS):
        for name, key in suite:
            t0 = time.monotonic()
            df = qs[name](boot, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            rep_walls[key].append(round(time.monotonic() - t0, 3))
            # per-call caches (e.g. the boilerplate blacklist) are
            # hung on the returned frame; release after the action
            cache = getattr(df, "_blacklist_cache", None)
            if cache is not None:
                cache.unpersist()
    for _name, key in suite:
        if key in stress_keys:
            extra.setdefault("operator_stress_walls_s", {})[key] = min(
                rep_walls[key]
            )
        else:
            results[key] = min(rep_walls[key])
    rep_walls["ex_extract"] = ex_walls
    extra["query_rep_walls_s"] = rep_walls
    extra["query_reps"] = QUERY_REPS
    boot.stop()

    # ---- scaling evidence: N vs 4N cores. The two levels are
    # INTERLEAVED (4,16,4,16,…) so a co-tenant load spike hits both
    # levels, not just one block; min-of-reps per level then removes
    # the spiked samples. (One SparkContext per process → sessions are
    # created/stopped per rep; their startup is outside the timer.)
    if DO_SCALING:
        # scaling input = the 2.4M-turn "scale" tier: with the current
        # kernel the bench tier finishes in ~4s at 16 cores, where job
        # fixed costs (scan, shuffle setup) dominate and mask the
        # compute scaling the north rule is about — 4x volume puts the
        # measurement back in the compute-bound regime of 10^12 turns.
        boot2 = build_session(CPUS)
        spath = ensure_transcripts(boot2, "scale")
        s_turns = boot2.read.parquet(spath).count()
        # page-cache warm: parquet count() reads only footers, so
        # without this the FIRST timed rep pays the cold disk read of
        # the text payload (~25% inflation observed) — a one-time cost
        # that belongs to neither parallelism level. Full-payload
        # length-sum at full cores reads every byte once, cheaply.
        from pyspark.sql import functions as _F

        boot2.read.parquet(spath).agg(_F.sum(_F.length("text"))).collect()
        boot2.stop()
        n_low, n_high = SCALE_N, SCALE_N * 4
        walls: dict[int, list[float]] = {n_low: [], n_high: []}
        rep_load: dict[int, list[float]] = {n_low: [], n_high: []}
        rep_waited: dict[int, list[float]] = {n_low: [], n_high: []}
        for _rep in range(SCALE_REPS):
            for cores in (n_low, n_high):
                # loadavg precondition (bounded): don't start a timed
                # rep into a co-tenant spike; record what we saw either
                # way so the reading is auditable inline
                waited, load = wait_for_quiet(SCALE_LOAD_GATE, SCALE_LOAD_WAIT_S)
                rep_waited[cores].append(waited)
                rep_load[cores].append(load)
                spark = build_session(cores)
                from pyspark.sql import functions as F

                from inxs_spark.plans.extract_pipeline import extract_df

                extract_df(
                    spark.read.parquet(spath).limit(20000), num_partitions=cores
                ).agg(F.count("*")).collect()  # warm the python workers
                walls[cores].append(timed_extraction(spark, spath))
                spark.stop()
        t_low, t_high = min(walls[n_low]), min(walls[n_high])
        eff = (s_turns / t_high) / (s_turns / t_low) / (n_high / n_low)
        extra["scaling"] = {
            "pair": f"local[{n_low}] vs local[{n_high}]",
            "input_turns": s_turns,
            f"local{n_low}_s": round(t_low, 2),
            f"local{n_high}_s": round(t_high, 2),
            f"local{n_low}_turns_per_s": round(s_turns / t_low, 1),
            f"local{n_high}_turns_per_s": round(s_turns / t_high, 1),
            "efficiency": round(eff, 3),
            "all_walls_s": {str(k): [round(x, 2) for x in v] for k, v in walls.items()},
            "rep_loadavg_1m": {str(k): v for k, v in rep_load.items()},
            "rep_quiet_wait_s": {str(k): v for k, v in rep_waited.items()},
            "load_gate": SCALE_LOAD_GATE,
        }
        ceiling = raw_ceiling(n_low, n_high)
        extra["scaling"]["box_ceiling_efficiency_raw_multiproc"] = ceiling["efficiency"]
        extra["scaling"]["efficiency_vs_box_ceiling"] = round(
            eff / ceiling["efficiency"], 3
        ) if ceiling["efficiency"] else None
        extra["scaling"]["loadavg_1m_at_end"] = round(os.getloadavg()[0], 2)

    total = round(sum(results.values()), 3)
    line = {
        "metric": "headline suite wall time (extraction + relational + dedup + similarity)",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        **extra,
    }
    print(json.dumps(line))
    _append_bench_md(line)


def _append_bench_md(line: dict) -> None:
    try:
        import datetime

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as fh:
            fh.write(
                f"\n## run {datetime.datetime.now().isoformat(timespec='seconds')}\n\n"
                f"```json\n{json.dumps(line, indent=2)}\n```\n"
            )
    except Exception:
        pass  # bench output contract is the stdout JSON line


if __name__ == "__main__":
    main()
