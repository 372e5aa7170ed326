"""Capture .explain('formatted') for the round-6 optimization targets.

Usage: python tools/capture_plans_r06.py before|after [query ...]
Writes plans/r06/<query>_<tag>.txt for each target query at
$SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not timing).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TARGETS = [
    "x_minhash_dup_pairs",
    "q_cosine_topk",
    "q_latest_order_per_customer",
    "q_regional_revenue",
    "q1_pricing_summary",
    "x_extract_transcripts",
    "q_boilerplate_lines",
    "q_containment_pairs",
]


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:]) or None

    import __spark_entry__ as entry
    from inxs_spark.sources.session import get_spark

    spark = get_spark(master="local[8]")
    qs = {**entry.queries(), **entry.extra_queries()}
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in TARGETS:
        if only and name not in only:
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} (sf_dir={SF_DIR})\n\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        cache = getattr(df, "_blacklist_cache", None)
        if cache is not None:
            cache.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
