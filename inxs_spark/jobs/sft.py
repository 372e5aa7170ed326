"""SFT dataset-assembly job: raw agent transcripts → training examples.

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → main-content extraction      (the rules kernel, one Arrow hop)
      → degenerate-loop drop         (optional: conversations whose
                                      agent re-invoked one tool
                                      >= min_run times in a row)
      → SFT context-window assembly  (one example per assistant turn,
                                      history = maximal prior suffix
                                      under the token budget; budget
                                      in whitespace tokens or, with
                                      --tokenizer-json, trained-BPE
                                      subword tokens)
      → parquet + one JSON stats line

This is the composed job a training-data team would ship for the
"turn a 10^12-turn transcript lake into an SFT dataset" flow; every
stage is one of the repo's tested operators. Stage shapes: extraction
is the salted-repartition mapInArrow pipeline (plans/
extract_pipeline.py), the loop drop is a left_anti join on a
conv-id set produced by one window pass, the assembly is two windows
+ one conv-keyed equi-join (operators/conversations.py). Stage
boundaries persist (MEMORY_AND_DISK) following the curate() single-
pass discipline — the input is scanned once for extraction and once
for the role join-back/loop scan, never per stage count.

Local smoke:

    python -m inxs_spark.jobs.sft --tier tiny --out /tmp/sft --budget 64
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

#: stage names in pipeline order — shared by the stats line and tests
SFT_STAGES = (
    "input_turns",
    "extracted_turns",
    "turns_after_loop_drop",
    "examples",
)


def assemble_sft_dataset(
    turns: DataFrame,
    budget: int,
    tokenizer=None,
    drop_loops_min_run: int | None = None,
    target_role: str = "assistant",
    out: str | None = None,
) -> tuple[DataFrame, dict]:
    """The library seam under the CLI: returns (examples, stats).

    ``turns`` must carry (conv_id, turn_idx, role, text); ``tool`` is
    required only when ``drop_loops_min_run`` is set. When ``out`` is
    given the examples are written there and every cache released;
    otherwise the returned frame stays persisted for the caller's
    action (release with ``spark.catalog.clearCache()`` in library
    use — the curate() contract)."""
    from ..operators.conversations import assemble_sft_examples
    from ..plans.extract_pipeline import extract_df

    from pyspark.storagelevel import StorageLevel

    lvl = StorageLevel.MEMORY_AND_DISK
    stats: dict = {}
    walls: dict = {}

    t0 = time.monotonic()
    extracted = extract_df(turns).persist(lvl)
    # ONE action for count + failure tally (a separate filter().count()
    # would re-read the cache and pay a second job's scheduling)
    row = extracted.agg(
        F.count("*").alias("n"),
        F.sum(F.col("failure").isNotNull().cast("long")).alias("f"),
    ).collect()[0]
    stats["input_turns"] = stats["extracted_turns"] = int(row.n)
    stats["extraction_failures"] = int(row.f or 0)
    walls["extract"] = time.monotonic() - t0

    # join the role plane back: extraction prunes to (conv_id,
    # turn_idx, text) before its exchange, so role/tool ride a second
    # narrow scan of the source, not the kernel hop
    t0 = time.monotonic()
    ex = extracted.join(
        turns.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"]
    )

    stats["convs_dropped_as_loops"] = 0
    loop_convs = None
    if drop_loops_min_run is not None:
        from ..operators.trajectories import detect_tool_loops

        loop_convs = (
            detect_tool_loops(turns, min_run=drop_loops_min_run)
            .select("conv_id")
            .distinct()
            .persist(lvl)
        )
        # the flagged set is tiny (conversations, not turns): count IT
        # for the lineage stat instead of two full distinct()
        # aggregations over the turn frames (the first capture of this
        # job spent ~40% of its wall on exactly that bookkeeping)
        stats["convs_dropped_as_loops"] = loop_convs.count()
        ex = ex.join(loop_convs, "conv_id", "left_anti")
    ex = ex.persist(lvl)
    stats["turns_after_loop_drop"] = ex.count()
    extracted.unpersist()
    if loop_convs is not None:
        loop_convs.unpersist()
    walls["loop_drop"] = time.monotonic() - t0

    t0 = time.monotonic()
    examples = assemble_sft_examples(
        ex,
        budget,
        text_col="extracted_text",
        target_role=target_role,
        tokenizer=tokenizer,
    ).persist(lvl)
    agg = examples.agg(
        F.count("*").alias("n"),
        F.sum("history_tokens").alias("h"),
        F.sum("target_tokens").alias("t"),
        F.round(F.avg("n_history_turns"), 3).alias("a"),
    ).collect()[0]
    stats["examples"] = int(agg.n)
    stats["sum_history_tokens"] = int(agg.h or 0)
    stats["sum_target_tokens"] = int(agg.t or 0)
    stats["avg_history_turns"] = float(agg.a or 0.0)
    ex.unpersist()
    walls["assemble"] = time.monotonic() - t0

    stats["budget"] = budget
    stats["token_unit"] = "bpe" if tokenizer is not None else "whitespace"
    stats["stage_walls_s"] = {k: round(v, 3) for k, v in walls.items()}

    if out is not None:
        t0 = time.monotonic()
        examples.write.mode("overwrite").parquet(out)
        stats["stage_walls_s"]["write"] = round(time.monotonic() - t0, 3)
        examples.unpersist()
    return examples, stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.sft")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcripts parquet path")
    src.add_argument("--tier", help="synthetic tier name (tiny/small/...)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--master", default="local[*]")
    parser.add_argument("--budget", type=int, default=512,
                        help="max history tokens per example")
    parser.add_argument("--tokenizer-json", default=None,
                        help="frozen bpe.json — budget in subword tokens")
    parser.add_argument("--drop-loops", type=int, default=None, metavar="N",
                        help="drop conversations with >= N consecutive "
                             "same-tool calls")
    parser.add_argument("--target-role", default="assistant")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(master=args.master, app_name="inxs_spark-sft")
    try:
        if args.input:
            turns = spark.read.parquet(args.input)
        else:
            from ..sources.transcripts import ensure_transcripts

            turns = spark.read.parquet(ensure_transcripts(spark, args.tier))
        tokenizer = None
        if args.tokenizer_json:
            from ..operators.tokenizer import BpeTokenizer

            tokenizer = BpeTokenizer.load(args.tokenizer_json)
        _, stats = assemble_sft_dataset(
            turns,
            budget=args.budget,
            tokenizer=tokenizer,
            drop_loops_min_run=args.drop_loops,
            target_role=args.target_role,
            out=os.path.join(args.out, "sft_examples"),
        )
        stats["output"] = os.path.join(args.out, "sft_examples")
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
