"""Standalone scaling-pair capture (the BENCH scaling evidence, without
the rest of the suite).

Runs the extraction job on the 2.4M-turn "scale" tier at local[N] and
local[4N], interleaved, min-of-reps, plus the raw-multiprocessing box
ceiling — exactly the bench.py methodology — and appends the result to
BENCH.md. Use this to grab a clean measurement in a low-load window on
the shared box:

    python tools/scaling_capture.py [--reps 2] [--n 4] [--max-load 1.5]

Exits nonzero without running if the 1-minute load average exceeds
--max-load (co-tenant noise would corrupt the measurement).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses build_session/timed_extraction/raw_ceiling)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--max-load", type=float, default=1.5)
    args = ap.parse_args()

    load = os.getloadavg()[0]
    if load > args.max_load:
        print(json.dumps({"skipped": True, "loadavg_1m": load}))
        return 1

    from inxs_spark.sources.transcripts import ensure_transcripts

    boot = bench.build_session(bench.CPUS)
    spath = ensure_transcripts(boot, "scale")
    s_turns = boot.read.parquet(spath).count()
    boot.stop()

    n_low, n_high = args.n, args.n * 4
    walls: dict[int, list[float]] = {n_low: [], n_high: []}
    loads: list[float] = []
    for _rep in range(args.reps):
        for cores in (n_low, n_high):
            # per-REP loadavg gate (same discipline as bench.py): the
            # entry gate alone let co-tenant spikes land mid-run — a
            # 0.41-load start still recorded local[16] reps at load
            # 4.8 (BENCH.md 2026-08-17 captures)
            bench.wait_for_quiet(args.max_load + 1.5, 120)
            spark = bench.build_session(cores)
            from pyspark.sql import functions as F

            from inxs_spark.plans.extract_pipeline import extract_df

            extract_df(
                spark.read.parquet(spath).limit(20000), num_partitions=cores
            ).agg(F.count("*")).collect()
            loads.append(round(os.getloadavg()[0], 2))
            walls[cores].append(bench.timed_extraction(spark, spath))
            spark.stop()
    t_low, t_high = min(walls[n_low]), min(walls[n_high])
    eff = (t_low / t_high) / (n_high / n_low)
    ceiling = bench.raw_ceiling(n_low, n_high)
    out = {
        "metric": "scaling capture (extraction only, scale tier)",
        "pair": f"local[{n_low}] vs local[{n_high}]",
        "input_turns": s_turns,
        f"local{n_low}_s": round(t_low, 2),
        f"local{n_high}_s": round(t_high, 2),
        f"local{n_low}_turns_per_s": round(s_turns / t_low, 1),
        f"local{n_high}_turns_per_s": round(s_turns / t_high, 1),
        "efficiency": round(eff, 3),
        "all_walls_s": {str(k): [round(x, 2) for x in v] for k, v in walls.items()},
        "box_ceiling_efficiency_raw_multiproc": ceiling["efficiency"],
        "efficiency_vs_box_ceiling": round(eff / ceiling["efficiency"], 3)
        if ceiling["efficiency"]
        else None,
        "loadavg_1m_before_each_rep": loads,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## scaling capture {datetime.datetime.now().isoformat(timespec='seconds')}\n\n"
            f"```json\n{json.dumps(out, indent=2)}\n```\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
