"""Conversation-level operators over extracted turns — the payload
domain's canonical rollups (multi-turn transcripts, BASELINE.json:15).

All pure JVM: order-sensitive reconstruction uses
``array_sort(collect_list(struct(turn_idx, ...)))`` — sorting the
struct array by its leading field — instead of a window + second
aggregation, so each operator is ONE hash-aggregate shuffle on
conv_id. At 10^12 turns this is the cheapest possible shape; giant
conversations are bounded (≤2000 turns) so per-group state stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_documents(
    extracted: DataFrame, sep: str = "\n", role_col: str | None = None
) -> DataFrame:
    """(conv_id, turn_idx, extracted_text[, role]) → one document per
    conversation with turns in order: the conversation-level training
    document."""
    cols = [F.col("turn_idx")]
    if role_col:
        cols.append(F.col(role_col))
    cols.append(F.coalesce(F.col("extracted_text"), F.lit("")).alias("t"))
    packed = F.struct(*cols)
    agg = extracted.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(packed)).alias("turns")
    )
    if role_col:
        text = F.expr(
            f"array_join(transform(turns, s -> concat(s.{role_col}, ': ', s.t)), '{sep}')"
        )
    else:
        text = F.expr(f"array_join(transform(turns, s -> s.t), '{sep}')")
    return agg.select(
        "conv_id",
        F.size("turns").cast("long").alias("n_turns"),
        text.alias("conv_text"),
    )


def conversation_stats(extracted: DataFrame) -> DataFrame:
    return extracted.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.when(F.col("failure").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_failures"),
        F.sum(F.length(F.coalesce("extracted_text", F.lit(""))))
        .cast("long").alias("total_chars"),
    )


def conversation_dup_groups(extracted: DataFrame) -> DataFrame:
    """Conversation-level exact dedup: identical reconstructed
    documents (boilerplate-stripped) → groups. Composes
    conversation_documents with the digest-keyed dedup shape."""
    docs = conversation_documents(extracted)
    return (
        docs.select(F.md5("conv_text").alias("fp_md5"), "conv_id")
        .groupBy("fp_md5")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("conv_id").alias("keep_conv_id"),
        )
        .filter(F.col("n_dups") > 1)
    )
