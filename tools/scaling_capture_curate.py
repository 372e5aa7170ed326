"""Scaling-pair capture for the COMPOSED curation funnel (round-4
verdict task 5: all prior scaling evidence ran the extraction flagship;
curate() has different shuffle/cache behavior — minhash exchanges,
connected components, staged persists — so its efficiency is measured
separately).

Methodology identical to tools/scaling_capture.py / bench.py: local[N]
vs local[4N], interleaved, min-of-reps, per-REP loadavg gate, raw
multiprocessing box ceiling, appended to BENCH.md.

Input: (doc_id, text) rows derived once from the 2.4M-turn "scale"
transcripts tier (doc_id = xxhash64(conv_id, turn_idx) — deterministic;
collision odds ~1e-7 at this size) and cached as parquet under .data/,
capped at --docs rows so one local[4] funnel rep stays in minutes.

    python tools/scaling_capture_curate.py [--reps 2] [--n 4] \
        [--docs 250000] [--max-load 1.5]
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

DOCS_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".data", "curate_docs_scale",
)


def ensure_docs(spark, n_docs: int) -> str:
    """Materialize (once per --docs value) the curation input."""
    from pyspark.sql import functions as F

    from inxs_spark.sources.transcripts import ensure_transcripts

    path = f"{DOCS_CACHE}_{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    tpath = ensure_transcripts(spark, "scale")
    (
        spark.read.parquet(tpath)
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .limit(n_docs)
        .select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
            F.col("text"),
        )
        # limit() collapses to ONE partition — written as-is that is a
        # single parquet file (≈1 row group), capping every downstream
        # SCAN at parallelism ~1 and silently flattening the very
        # scaling curve this tool measures. Spread the cached input
        # over 64 files so the timed runs' parallelism is the
        # session's, not the file layout's.
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    )
    return path


def timed_curate(spark, docs_path: str) -> float:
    """One full curate() funnel over the cached docs; returns wall
    seconds. Output goes to a throwaway tmp dir (the write is part of
    the job's contract and included in the wall, as in production)."""
    from inxs_spark.jobs.curate import curate

    out = tempfile.mkdtemp(prefix="curate_scale_")
    try:
        t0 = time.monotonic()
        _df, stats = curate(
            spark.read.parquet(docs_path),
            jaccard_threshold=0.85,
            min_quality=0.0,
            out=os.path.join(out, "curated"),
        )
        wall = time.monotonic() - t0
        timed_curate.last_stats = stats
        return wall
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--max-load", type=float, default=1.5)
    args = ap.parse_args()

    load = os.getloadavg()[0]
    if load > args.max_load:
        print(json.dumps({"skipped": True, "loadavg_1m": load}))
        return 1

    boot = bench.build_session(bench.CPUS)
    docs_path = ensure_docs(boot, args.docs)
    n_docs = boot.read.parquet(docs_path).count()
    boot.stop()

    n_low, n_high = args.n, args.n * 4
    walls: dict[int, list[float]] = {n_low: [], n_high: []}
    loads: list[float] = []
    for _rep in range(args.reps):
        for cores in (n_low, n_high):
            bench.wait_for_quiet(args.max_load + 1.5, 120)
            spark = bench.build_session(cores)
            loads.append(round(os.getloadavg()[0], 2))
            walls[cores].append(timed_curate(spark, docs_path))
            spark.stop()
    t_low, t_high = min(walls[n_low]), min(walls[n_high])
    eff = (t_low / t_high) / (n_high / n_low)
    ceiling = bench.raw_ceiling(n_low, n_high)
    out = {
        "metric": "scaling capture (composed curation funnel, scale-tier docs)",
        "pair": f"local[{n_low}] vs local[{n_high}]",
        "input_docs": n_docs,
        "funnel_stages": getattr(timed_curate, "last_stats", None),
        f"local{n_low}_s": round(t_low, 2),
        f"local{n_high}_s": round(t_high, 2),
        f"local{n_low}_docs_per_s": round(n_docs / t_low, 1),
        f"local{n_high}_docs_per_s": round(n_docs / t_high, 1),
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
            f"\n## curation scaling capture "
            f"{datetime.datetime.now().isoformat(timespec='seconds')}\n\n"
            f"```json\n{json.dumps(out, indent=2)}\n```\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
