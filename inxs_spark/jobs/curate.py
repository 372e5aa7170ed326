"""Corpus-curation pipeline job: the composed training-data flow.

    documents
      → exact dedup            (md5 groups, keep min id)
      → near-dup prune         (MinHash+LSH candidates → exact-Jaccard
                                verify → drop the higher id of each pair)
      → quality + language gate (stopword/punct/length score, lang-ID)
      → PII scrub              (emails, long digit runs)
      → deterministic quota sample per language (optional)
      → parquet + one JSON stats line + queryable metrics table

Every stage is one of the repo's tested operators; this job is the
composition a 100 TB curation run would ship. Stage plan notes:
dedup/minhash shuffle digests and signatures (never full text twice),
the near-dup drop is an anti-join of the loser-id set, the quality
gate is a codegen projection, quota sampling is a hash-ordered window.
Dropped rows are COUNTED per stage (no silent attrition — the stats
line and the metrics table are the lineage record).

SINGLE-PASS LINEAGE (round-3 verdict finding #2): the previous
implementation ran five uncached ``.count()`` actions, each of which
re-executed the whole upstream lineage from the input scan, and the
final write recomputed everything once more — a ~5-6× work multiplier
at scale. Stage outputs are now persisted (MEMORY_AND_DISK — spills,
never OOMs) at each boundary: every stage computes EXACTLY ONCE, the
input is scanned EXACTLY ONCE (test-asserted via a row-tap
accumulator), each stage count reads its own cache, and earlier
caches are released as soon as the next stage materializes. The FINAL
stage stays cached so the caller's action (or the ``out=`` write this
function performs) is a cache read, not a recompute; pass ``out=`` to
have the write + full unpersist handled here, or call
``spark.catalog.clearCache()`` when done in library use. At
petabyte scale the same boundaries would be checkpoint TABLES rather
than caches — the staging seam is this function.

Local smoke:

    python -m inxs_spark.jobs.curate --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated --quota 50
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

#: stage names in pipeline order — shared by stats, the metrics table
#: and the tests
CURATE_STAGES = (
    "input",
    "after_exact_dedup",
    "after_near_dup_prune",
    "after_quality_lang_gate",
    "output",
)

CURATE_METRICS_SCHEMA = (
    "op string, run_id string, stage string, stage_idx int, "
    "rows bigint, rows_dropped bigint, wall_s double"
)


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.85,
    min_quality: float = 0.3,
    quality_model=None,
    langs: tuple[str, ...] | None = None,
    quota_per_lang: int | None = None,
    normalize: bool = True,
    out: str | None = None,
    metrics_out: str | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, dict]:
    """Run the curation flow; returns (curated_df, stage_counts).

    ``normalize=True`` (default) runs both dedup stages over the
    CANONICALIZED text (NFC + casefold + whitespace collapse) so that
    byte-level noise can't defeat fingerprinting — mixed-case or
    unicode-variant duplicates collapse; the surviving rows keep their
    ORIGINAL text.

    ``quality_model=`` (an ``operators.classify.QualityClassifier``)
    swaps the heuristic quality gate for the trained model's
    probability — ``min_quality`` then thresholds P(good) instead of
    the blended heuristic score. Still a pure column expression, so
    the gate stays a codegen projection either way; defaults are
    unchanged (the curation-parity oracle pins the heuristic path).

    ``out=`` writes the curated parquet here (the write is a cache
    read) and releases every cache before returning. ``metrics_out=``
    additionally writes the per-stage attrition lineage as a QUERYABLE
    parquet metrics table (same pattern as the extraction runner's
    metrics_table) plus one JSON line per stage under
    ``<metrics_out>/metrics/``."""
    from pyspark import StorageLevel

    from ..operators.dedup import (
        dedup_keep_one_per_cluster,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from ..operators.text import (
        language_id_expr,
        normalize_expr,
        pii_scrub,
        quality_score_expr,
    )

    lvl = StorageLevel.MEMORY_AND_DISK
    t0 = time.monotonic()
    walls: dict[str, float] = {}
    stats: dict[str, int] = {}

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

    # stage 0: the ONLY input scan — everything downstream reads this
    # cache (exact_dedup alone consumes it twice: digest groups + join
    # back). If the CALLER already persisted this exact frame
    # (normalize=False passes it through unchanged), do NOT
    # persist/unpersist it here: our unpersist would silently evict
    # the caller's cache entry (round-4 review finding)
    caller_cached = (
        df.storageLevel.useMemory or df.storageLevel.useDisk
    )
    c0 = df if caller_cached else df.persist(lvl)
    stats["input"] = c0.count()
    walls["input"] = time.monotonic() - t0

    t = time.monotonic()
    deduped = exact_dedup(c0, id_col, dd_col).persist(lvl)
    stats["after_exact_dedup"] = deduped.count()
    walls["after_exact_dedup"] = time.monotonic() - t
    if not caller_cached:
        c0.unpersist()

    t = time.monotonic()
    # prune_verify: the eager jobs-path verify (candidates materialize
    # once, verify touches candidate docs only); the cache it pins is
    # released right after connected components consumes the edges,
    # keeping this function's release-everything contract
    pairs = minhash_dedup_pairs(
        deduped, id_col=id_col, text_col=dd_col,
        threshold=jaccard_threshold, prune_verify="auto",
        corpus_n_rows=stats["after_exact_dedup"],
    )
    # component-correct: keep the min id of every CONNECTED near-dup
    # cluster (pairwise loser-dropping over-deletes on chains A~B~C);
    # connected_components materializes the edge set eagerly — those
    # bounded jobs read the deduped CACHE, not the input
    pruned = dedup_keep_one_per_cluster(deduped, pairs, id_col)
    if normalize:
        pruned = pruned.drop(dd_col)
    pruned = pruned.persist(lvl)
    stats["after_near_dup_prune"] = pruned.count()
    walls["after_near_dup_prune"] = time.monotonic() - t
    # release the candidate-pairs cache only AFTER pruned.count() has
    # materialized: releasing it earlier was safe only because
    # connected_components eagerly localCheckpoints the edge set — an
    # implicit cross-module coupling; if that eagerness ever changed,
    # the verify stage would silently re-execute from the source scan
    # (round-4 advice)
    if getattr(pairs, "_candidate_pairs_cache", None) is not None:
        pairs._candidate_pairs_cache.unpersist()
    deduped.unpersist()

    t = time.monotonic()
    # quality and language are pure column expressions — attach them
    # with withColumn instead of the two id-joins the frame helpers
    # would force: at 2.4M docs those joins were two full shuffles of
    # the text frame for zero semantic difference (round-5 scaling
    # profile of this funnel)
    q_expr = (
        quality_model.score_expr(text_col)
        if quality_model is not None else quality_score_expr(text_col)
    )
    gated = (
        pruned.withColumn("quality", q_expr)
        .withColumn("lang_pred", language_id_expr(text_col))
        .filter(F.col("quality") >= min_quality)
    )
    if langs:
        gated = gated.filter(F.col("lang_pred").isin(list(langs)))
    gated = gated.persist(lvl)
    stats["after_quality_lang_gate"] = gated.count()
    walls["after_quality_lang_gate"] = time.monotonic() - t
    pruned.unpersist()

    t = time.monotonic()
    scrubbed = gated.join(
        pii_scrub(gated, id_col, text_col).select(id_col, "scrubbed"), id_col
    ).withColumn(text_col, F.col("scrubbed")).drop("scrubbed")

    if quota_per_lang is not None:
        # shared keyed-quota primitive — same md5-hash-order selection
        # rule as the per-domain quota (one definition, no drift)
        from ..operators.text import deterministic_quota

        scrubbed = deterministic_quota(
            scrubbed, "lang_pred", id_col, quota_per_lang
        )
    # final stage cached too: the output count AND the caller's action
    # (or the out= write below) both read it instead of re-running
    # scrub+quota
    scrubbed = scrubbed.persist(lvl)
    stats["output"] = scrubbed.count()
    walls["output"] = time.monotonic() - t
    gated.unpersist()

    if out is not None:
        scrubbed.write.mode("overwrite").parquet(out)
    if metrics_out is not None:
        write_curate_metrics(
            df.sparkSession, metrics_out, stats, walls,
            run_id=run_id or uuid.uuid4().hex[:12],
        )
    if out is not None:
        scrubbed.unpersist()
    return scrubbed, stats


def write_curate_metrics(
    spark: SparkSession,
    metrics_out: str,
    stats: dict,
    walls: dict | None = None,
    run_id: str = "local",
    op: str = "curate",
    compact: bool = True,
) -> None:
    """Persist per-stage attrition lineage: one JSON line per stage
    under ``<metrics_out>/metrics/`` (append-only, atomic rename —
    same contract as the extraction runner's per-partition records;
    like the runner, a DRIVER-LOCAL directory standing in for the
    metrics Iceberg table append of the production design) and, when
    ``compact=True``, the compacted ``<metrics_out>/metrics_table``
    parquet — so a production curation run's funnel is queryable next
    to the extraction lineage instead of living only in a returned
    dict. Per-record callers on a long stream should pass
    ``compact=False`` (appending is O(1) per call) and compact once
    at the end via :func:`compact_curate_metrics` — recompacting
    every call would re-read every prior record, O(N²) over a
    stream's lifetime (round-4 review finding)."""
    walls = walls or {}
    stages = [s for s in CURATE_STAGES if s in stats]
    rows = []
    prev = None
    for i, s in enumerate(stages):
        n = int(stats[s])
        rows.append({
            "op": op,
            "run_id": run_id,
            "stage": s,
            "stage_idx": i,
            "rows": n,
            "rows_dropped": (prev - n) if prev is not None else 0,
            "wall_s": round(float(walls.get(s, 0.0)), 3),
        })
        prev = n
    mdir = os.path.join(metrics_out, "metrics")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{op}_{run_id}.json.tmp")
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(mdir, f"{op}_{run_id}.json"))
    if compact:
        compact_curate_metrics(spark, metrics_out)


def compact_curate_metrics(spark: SparkSession, metrics_out: str) -> None:
    """Fold every per-run/per-batch metrics JSON into the queryable
    ``metrics_table`` parquet (one pass over all records — call once
    per run / at stream shutdown, not per microbatch)."""
    mdir = os.path.join(metrics_out, "metrics")
    if not os.path.isdir(mdir):
        return
    paths = [
        os.path.join(mdir, n)
        for n in sorted(os.listdir(mdir))
        if n.endswith(".json")
    ]
    if not paths:
        return
    spark.read.schema(CURATE_METRICS_SCHEMA).json(paths).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(metrics_out, "metrics_table"))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.jobs.curate")
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--out", required=True)
    parser.add_argument("--master", default="local[*]")
    parser.add_argument("--jaccard", type=float, default=0.85)
    parser.add_argument("--min-quality", type=float, default=0.3)
    parser.add_argument("--classifier-json", default=None,
                        help="trained QualityClassifier JSON; the quality "
                             "gate then thresholds its P(good)")
    parser.add_argument("--langs", default=None,
                        help="comma-separated language allowlist")
    parser.add_argument("--quota", type=int, default=None,
                        help="max docs per language (deterministic)")
    args = parser.parse_args(argv)

    from ..sources.session import get_spark

    spark: SparkSession = get_spark(master=args.master, app_name="inxs_spark-curate")
    try:
        df = spark.read.parquet(args.input)
        out_dir = os.path.join(args.out, "curated")
        model = None
        if args.classifier_json:
            from ..operators.classify import QualityClassifier

            with open(args.classifier_json) as fh:
                model = QualityClassifier.from_json(fh.read())
        _curated, stats = curate(
            df,
            jaccard_threshold=args.jaccard,
            min_quality=args.min_quality,
            quality_model=model,
            langs=tuple(args.langs.split(",")) if args.langs else None,
            quota_per_lang=args.quota,
            out=out_dir,
            metrics_out=args.out,
        )
        print(json.dumps({"output_path": out_dir, **stats}))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
