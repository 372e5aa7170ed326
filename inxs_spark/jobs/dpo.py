"""DPO preference-pair export job: raw transcripts → (chosen, rejected).

    transcripts (conv_id, turn_idx, role, text[, ...])
      → main-content extraction    (the rules kernel, one Arrow hop,
                                    role carried through the batch)
      → per-conversation scoring   (--scores parquet of
                                    (conv_id, score) — a reward-model
                                    output — or the default heuristic:
                                    mean quality_score_expr over the
                                    conversation's assistant turns)
      → preference-pair extraction (conversations sharing their first
                                    k extracted turns fork; best
                                    completion = chosen, worst =
                                    rejected, ties broken by conv id)
      → parquet + one JSON stats line

The sibling of jobs/sft.py for the post-training half of the
training-data story. Same execution discipline: lineage counts ride
``DataFrame.observe`` inside the main job (TWO actions total), the
one persisted boundary is the extracted-turns frame (consumed by both
the prefix windows and the scoring aggregate), and every stage is a
tested operator (operators/conversations.preference_pairs,
operators/text.quality_score_expr).

Pairing happens on EXTRACTED text deliberately: two conversations
whose raw payloads differ only in boilerplate (tool banners, markup)
fork exactly where their content forks, which is the preference
signal a trainer wants.

Local smoke:

    python -m inxs_spark.jobs.dpo --tier tiny --out /tmp/dpo --k-turns 2
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def extract_preference_pairs(
    turns: DataFrame,
    k_turns: int = 3,
    scores: DataFrame | None = None,
    out: str | None = None,
) -> tuple[DataFrame, dict]:
    """The library seam under the CLI: returns (pairs, stats).

    ``turns`` must carry (conv_id, turn_idx, role, text). ``scores``
    is an optional (conv_id, score) frame — a reward model's output;
    omitted, each conversation scores as the mean heuristic quality of
    its assistant turns' extracted text. When ``out`` is given the
    pairs are written there and caches released; otherwise the
    returned frame stays persisted for the caller's action."""
    from pyspark.sql import Observation
    from pyspark.storagelevel import StorageLevel

    from ..operators.conversations import preference_pairs
    from ..operators.text import quality_score_expr
    from ..plans.extract_pipeline import extract_df

    lvl = StorageLevel.MEMORY_AND_DISK
    stats: dict = {}
    walls: dict = {}

    t0 = time.monotonic()
    obs_extract = Observation()
    extracted = (
        extract_df(turns, passthrough_cols=("role",))
        .observe(
            obs_extract,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("failure").isNotNull().cast("long")).alias("f"),
        )
        .persist(lvl)
    )

    stats["score_source"] = "heuristic" if scores is None else "provided"
    if scores is None:
        scores = (
            extracted.filter(F.col("role") == "assistant")
            .groupBy("conv_id")
            .agg(
                # all-failed conversations score 0 rather than null (a
                # null score would make the struct-extreme selection
                # engine-defined)
                F.coalesce(
                    F.avg(quality_score_expr("extracted_text")), F.lit(0.0)
                ).alias("score")
            )
        )

    pairs = preference_pairs(
        extracted, scores, k_turns=k_turns, text_col="extracted_text"
    )
    obs_pairs = Observation()
    pairs = pairs.observe(
        obs_pairs,
        F.count(F.lit(1)).alias("n"),
        F.sum("n_candidates").alias("cands"),
    )

    # ONE action: the write (or a count that leaves the frame cached
    # for library callers); all observed stats fill afterwards
    if out is not None:
        pairs.write.mode("overwrite").parquet(out)
    else:
        pairs = pairs.persist(lvl)
        pairs.count()
    stats["input_turns"] = int(obs_extract.get["n"])
    stats["extraction_failures"] = int(obs_extract.get["f"] or 0)
    stats["pairs"] = int(obs_pairs.get["n"])
    stats["fork_candidates"] = int(obs_pairs.get["cands"] or 0)
    stats["k_turns"] = k_turns
    extracted.unpersist()
    walls["total"] = time.monotonic() - t0
    stats["stage_walls_s"] = {k: round(v, 3) for k, v in walls.items()}
    return pairs, stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.dpo")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts parquet path")
    src.add_argument("--tier", help="synthetic tier name (tiny/small/...)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--master", default="local[*]")
    parser.add_argument("--k-turns", type=int, default=3,
                        help="shared-prefix length defining a fork")
    parser.add_argument("--scores", default=None,
                        help="(conv_id, score) parquet — reward-model "
                             "output; default: heuristic quality of "
                             "assistant turns")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(master=args.master, app_name="inxs_spark-dpo")
    try:
        if args.input:
            turns = spark.read.parquet(args.input)
        else:
            from ..sources.transcripts import ensure_transcripts

            turns = spark.read.parquet(ensure_transcripts(spark, args.tier))
        scores = spark.read.parquet(args.scores) if args.scores else None
        _, stats = extract_preference_pairs(
            turns,
            k_turns=args.k_turns,
            scores=scores,
            out=os.path.join(args.out, "preference_pairs"),
        )
        stats["output"] = os.path.join(args.out, "preference_pairs")
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
