"""Corpus-curation pipeline job: the composed training-data flow.

    documents
      → exact dedup            (md5 groups, keep min id)
      → near-dup prune         (MinHash+LSH candidates → exact-Jaccard
                                verify → drop the higher id of each pair)
      → quality + language gate (stopword/punct/length score, lang-ID)
      → PII scrub              (emails, long digit runs)
      → deterministic quota sample per language (optional)
      → parquet + one JSON stats line

Every stage is one of the repo's tested operators; this job is the
composition a 100 TB curation run would ship. Stage plan notes:
dedup/minhash shuffle digests and signatures (never full text twice),
the near-dup drop is a broadcast anti-join of the (small) loser-id
set, the quality gate is a codegen projection, quota sampling is a
hash-ordered window. Dropped rows are COUNTED per stage (no silent
attrition — the stats line is the lineage record).

Local smoke:

    python -m inxs_spark.jobs.curate --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated --quota 50
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.85,
    min_quality: float = 0.3,
    langs: tuple[str, ...] | None = None,
    quota_per_lang: int | None = None,
    normalize: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the curation flow; returns (curated_df, stage_counts).

    ``normalize=True`` (default) runs both dedup stages over the
    CANONICALIZED text (NFC + casefold + whitespace collapse) so that
    byte-level noise can't defeat fingerprinting — mixed-case or
    unicode-variant duplicates collapse; the surviving rows keep their
    ORIGINAL text."""
    from pyspark.sql.window import Window

    from ..operators.dedup import (
        dedup_keep_one_per_cluster,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from ..operators.text import (
        language_id,
        normalize_expr,
        pii_scrub,
        quality_score,
    )

    stats: dict[str, int] = {"input": df.count()}

    dd_col = text_col
    if normalize:
        # helper-column name guaranteed absent from df.columns —
        # withColumn silently REPLACES an existing column, so a caller
        # frame that already had one named '__norm_text' would be
        # corrupted (round-3 advice finding)
        dd_col = "__norm_text"
        while dd_col in df.columns:
            dd_col = "_" + dd_col
        df = df.withColumn(dd_col, normalize_expr(text_col))

    deduped = exact_dedup(df, id_col, dd_col)
    stats["after_exact_dedup"] = deduped.count()

    pairs = minhash_dedup_pairs(
        deduped, id_col=id_col, text_col=dd_col,
        threshold=jaccard_threshold,
    )
    # component-correct: keep the min id of every CONNECTED near-dup
    # cluster (pairwise loser-dropping over-deletes on chains A~B~C)
    pruned = dedup_keep_one_per_cluster(deduped, pairs, id_col)
    if normalize:
        pruned = pruned.drop(dd_col)
    stats["after_near_dup_prune"] = pruned.count()

    quality = quality_score(pruned, id_col, text_col).select(id_col, "quality")
    lang = language_id(pruned, id_col, text_col).select(id_col, "lang_pred")
    gated = (
        pruned.join(quality, id_col)
        .join(lang, id_col)
        .filter(F.col("quality") >= min_quality)
    )
    if langs:
        gated = gated.filter(F.col("lang_pred").isin(list(langs)))
    stats["after_quality_lang_gate"] = gated.count()

    scrubbed = gated.join(
        pii_scrub(gated, id_col, text_col).select(id_col, "scrubbed"), id_col
    ).withColumn(text_col, F.col("scrubbed")).drop("scrubbed")

    if quota_per_lang is not None:
        w = Window.partitionBy("lang_pred").orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        )
        scrubbed = (
            scrubbed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= quota_per_lang)
            .drop("__rn")
        )
    stats["output"] = scrubbed.count()
    return scrubbed, stats


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.curate")
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--out", required=True)
    parser.add_argument("--master", default="local[*]")
    parser.add_argument("--jaccard", type=float, default=0.85)
    parser.add_argument("--min-quality", type=float, default=0.3)
    parser.add_argument("--langs", default=None,
                        help="comma-separated language allowlist")
    parser.add_argument("--quota", type=int, default=None,
                        help="max docs per language (deterministic)")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(master=args.master, app_name="inxs_spark-curate")
    try:
        df = spark.read.parquet(args.input)
        curated, stats = curate(
            df,
            jaccard_threshold=args.jaccard,
            min_quality=args.min_quality,
            langs=tuple(args.langs.split(",")) if args.langs else None,
            quota_per_lang=args.quota,
        )
        curated.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"output_path": args.out, **stats}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
