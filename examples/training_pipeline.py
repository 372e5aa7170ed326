"""End-to-end training-data pipeline: the engine's pieces composed the
way a 100 TB corpus build would chain them.

    transcripts ──▶ extract (rules kernel, mapInArrow)
                ──▶ quality gate (JVM-side scoring, no Python)
                ──▶ exact dedup (hash groupBy, keep min key)
                ──▶ conversation documents (ordered reassembly)
                ──▶ sequence packing (concat-then-chunk, <eod>)
                ──▶ token counts + summary

Run:  python examples/training_pipeline.py [--tier tiny] [--master local[4]]

Every stage is a pure DataFrame transformation — at scale only the
extract stage crosses into Python (Arrow-batched); everything else is
Catalyst/codegen. Ordering correctness never depends on partition
layout (per-turn rows carry (conv_id, turn_idx); reassembly sorts
inside the aggregation).
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="tiny")
    ap.add_argument("--master", default="local[4]")
    args = ap.parse_args()

    from inxs_spark.operators.conversations import conversation_documents
    from inxs_spark.operators.dedup import exact_dedup
    from inxs_spark.operators.text import bpe_ish_tokens
    from inxs_spark.plans.extract_pipeline import extract_df
    from inxs_spark.sources.session import get_spark
    from inxs_spark.sources.transcripts import ensure_transcripts

    spark = get_spark(master=args.master, app_name="training-pipeline")
    path = ensure_transcripts(spark, args.tier)

    # 1. extract main content per turn (the only Python stage)
    extracted = extract_df(spark.read.parquet(path)).filter(
        F.col("failure").isNull() & (F.length("extracted_text") > 0)
    )

    # 2. quality gate, JVM-side: drop near-empty or punctuation-soup turns
    n_tokens = F.size(F.split(F.col("extracted_text"), r"\s+"))
    punct_ratio = F.length(
        F.regexp_replace("extracted_text", r"[a-zA-Z0-9\s]", "")
    ) / F.greatest(F.length("extracted_text"), F.lit(1))
    gated = extracted.filter((n_tokens >= 2) & (punct_ratio < 0.5))

    # 3. exact dedup of identical extracted turns (keep lowest key)
    keyed = gated.withColumn(
        "turn_key", F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
    )
    deduped = exact_dedup(keyed, id_col="turn_key", text_col="extracted_text")

    # 4. reassemble ordered per-conversation training documents
    docs = conversation_documents(
        deduped.select("conv_id", "turn_idx", "extracted_text", "failure")
    )

    # 5. pack into fixed-length training sequences (deterministic,
    #    cross-engine md5-ticket shards; every token exactly once)
    from inxs_spark.operators.text import pack_sequences

    packed = pack_sequences(
        docs, id_col="conv_id", text_col="conv_text",
        seq_len=512, n_shards=4,
    )
    pack = packed.agg(
        F.count("*").alias("n_seqs"),
        F.sum(F.when(F.col("n_tokens") == 512, 1).otherwise(0)).alias(
            "n_full_seqs"
        ),
        F.sum("n_tokens").alias("n_packed_tokens"),
    ).collect()[0]

    # 6. summary
    with_tokens = docs.withColumn(
        "n_tokens", F.size(bpe_ish_tokens("conv_text")).cast("long")
    )
    summary = with_tokens.agg(
        F.count("*").alias("n_documents"),
        F.sum("n_turns").alias("n_turns"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens_per_doc"),
    ).collect()[0]
    print(
        f"documents={summary.n_documents} turns={summary.n_turns} "
        f"tokens={summary.n_tokens} avg_tokens/doc={summary.avg_tokens_per_doc} "
        f"seqs={pack.n_seqs} full_seqs={pack.n_full_seqs} "
        f"packed_tokens={pack.n_packed_tokens}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
