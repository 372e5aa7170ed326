"""Scaling-pair capture for the COMPOSED SFT assembly job (jobs/
sft.py): extraction → loop drop → context-window assembly. The
extraction flagship and the curation funnel each have their own
captures; the SFT job adds a third composed shape — one Arrow hop,
two conv-keyed window passes, and two equi-joins — whose efficiency
is measured here separately.

Methodology identical to tools/scaling_capture.py /
scaling_capture_curate.py: local[N] vs local[4N], interleaved reps,
min-of-reps, per-rep loadavg gate, raw multiprocessing box ceiling,
appended to BENCH.md.

    python tools/scaling_capture_sft.py [--reps 2] [--n 4] \
        [--turns 600000] [--max-load 1.5]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses build_session/wait_for_quiet/raw_ceiling)

TURNS_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".data", "sft_turns_scale",
)


def ensure_turns(spark, n_turns: int) -> str:
    """Materialize (once per --turns value) the capped transcript
    input, spread over 64 files so the timed runs' scan parallelism
    is the session's, not the file layout's (the curate-capture
    lesson)."""
    from inxs_spark.sources.transcripts import ensure_transcripts

    path = f"{TURNS_CACHE}_{n_turns}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    tpath = ensure_transcripts(spark, "scale")
    (
        spark.read.parquet(tpath)
        .limit(n_turns)
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def timed_sft(spark, turns_path: str) -> float:
    """One full SFT assembly over the cached turns; the parquet write
    is part of the job's contract and included in the wall."""
    from inxs_spark.jobs.sft import assemble_sft_dataset

    out = tempfile.mkdtemp(prefix="sft_scale_")
    try:
        t0 = time.monotonic()
        _df, stats = assemble_sft_dataset(
            spark.read.parquet(turns_path),
            budget=64,
            drop_loops_min_run=3,
            out=os.path.join(out, "sft_examples"),
        )
        wall = time.monotonic() - t0
        timed_sft.last_stats = stats
        return wall
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--turns", type=int, default=600_000)
    ap.add_argument("--max-load", type=float, default=1.5)
    args = ap.parse_args()

    load = os.getloadavg()[0]
    if load > args.max_load:
        print(json.dumps({"skipped": True, "loadavg_1m": load}))
        return 1

    boot = bench.build_session(bench.CPUS)
    turns_path = ensure_turns(boot, args.turns)
    n_turns = boot.read.parquet(turns_path).count()
    # page-cache warm (the bench.py lesson): parquet count() reads
    # only footers; without a full-payload pass the first timed rep
    # pays the cold disk read — a cost that belongs to neither
    # parallelism level (first capture showed a 57s → 32s local[4]
    # warming trend across reps)
    from pyspark.sql import functions as F

    boot.read.parquet(turns_path).agg(F.sum(F.length("text"))).collect()
    boot.stop()

    n_low, n_high = args.n, args.n * 4
    walls: dict[int, list[float]] = {n_low: [], n_high: []}
    loads: list[float] = []
    for _rep in range(args.reps):
        for cores in (n_low, n_high):
            bench.wait_for_quiet(args.max_load + 1.5, 120)
            spark = bench.build_session(cores)
            loads.append(round(os.getloadavg()[0], 2))
            # warm the python workers / JIT before the timed wall
            from inxs_spark.plans.extract_pipeline import extract_df
            from pyspark.sql import functions as F

            extract_df(
                spark.read.parquet(turns_path).limit(20000),
                num_partitions=cores,
            ).agg(F.count("*")).collect()
            walls[cores].append(timed_sft(spark, turns_path))
            spark.stop()
    t_low, t_high = min(walls[n_low]), min(walls[n_high])
    eff = (t_low / t_high) / (n_high / n_low)
    ceiling = bench.raw_ceiling(n_low, n_high)
    out = {
        "metric": "scaling capture (composed SFT assembly job, scale-tier turns)",
        "pair": f"local[{n_low}] vs local[{n_high}]",
        "input_turns": n_turns,
        "job_stats": getattr(timed_sft, "last_stats", None),
        f"local{n_low}_s": round(t_low, 2),
        f"local{n_high}_s": round(t_high, 2),
        f"local{n_low}_turns_per_s": round(n_turns / t_low, 1),
        f"local{n_high}_turns_per_s": round(n_turns / t_high, 1),
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
            f"\n## SFT-assembly scaling capture "
            f"{datetime.datetime.now().isoformat(timespec='seconds')}\n\n"
            f"```json\n{json.dumps(out, indent=2)}\n```\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
