"""The Spark extraction pipeline (SURVEY.md §4.3, BASELINE.json:14).

Plan shape::

    scan (column-pruned to conv_id, turn_idx, text — Catalyst pushes
          the projection into the Parquet/Iceberg scan)
      → withColumn(salt = xxhash64(conv_id, turn_idx) % S)
      → repartition(P, conv_id, salt)          [one Exchange]
      → sortWithinPartitions(conv_id, turn_idx) [Tungsten sort, no shuffle]
      → mapInArrow(kernel executor)             [the only Python hop]

Skew: conversation lengths are Zipf-distributed (up to 2000 turns per
conv_id); hashing conv_id alone would send whole conversations to one
task. The salt spreads each conversation over ≤S partitions while the
per-partition sort restores stable (conv_id, turn_idx) runs — per-turn
extraction is row-independent, so correctness never depends on whole-
conversation locality (SURVEY.md §5.2 ordering invariant).

Vectorization: ``mapInArrow`` moves batches JVM→Python via Arrow IPC
once per ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows — no
per-row Python at the Spark API level (BASELINE.json:15). Inside the
batch the kernel runs per document, exactly like the reference library
would, minus lxml (SURVEY.md §0).

Lineage: each task writes a per-partition metrics JSON (rows in/out,
failures, wall ms, rule-set hash, input snapshot) via atomic rename —
the sandbox stand-in for a metrics Iceberg table append
(BASELINE.json:6). On a cluster this directory lives on shared storage.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Iterator, Optional

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..extract import MAIN_CONTENT, extract_turn
from ..kernel.transformation import Transformation

OUTPUT_SPARK_SCHEMA = (
    "conv_id string, turn_idx int, extracted_text string, "
    "spans array<struct<start:int,end:int,path:string>>, failure string"
)

SPAN_TYPE = pa.list_(
    pa.struct(
        [("start", pa.int32()), ("end", pa.int32()), ("path", pa.string())]
    )
)

_OUT_ARROW = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extracted_text", pa.string()),
        ("spans", SPAN_TYPE),
        ("failure", pa.string()),
    ]
)

DEFAULT_SALT_BUCKETS = 64


def make_extract_fn(
    transformation: Transformation,
    metrics_dir: Optional[str] = None,
    run_id: str = "",
    chunk_id: int = -1,
    input_snapshot_id: str = "",
    row_fn=None,
    passthrough_cols: tuple = (),
):
    """Build the mapInArrow function. The transformation object is
    captured in the closure — Spark cloudpickles it ONCE per job and
    reuses it for every batch on a worker (no per-batch deserialize).

    ``row_fn`` overrides the per-payload extractor (payload → (text,
    spans, failure)) — e.g. the DOM-heuristic density extractor; the
    default runs the declarative ``transformation``.

    ``passthrough_cols`` ride the Arrow batch untouched: extraction is
    1:1 per input row, so any caller that needs source columns next to
    the extracted text (the SFT job needs ``role``) can carry them
    through the hop instead of paying a full-corpus equi-join back to
    the source afterwards — at 10^12 turns that join is two more
    shuffles of the whole table."""
    import hashlib as _hashlib

    if row_fn is None:
        rule_set_hash = transformation.fingerprint()
    else:
        rule_set_hash = _hashlib.sha256(
            f"row_fn:{getattr(row_fn, '__module__', '')}."
            f"{getattr(row_fn, '__qualname__', repr(row_fn))}".encode()
        ).hexdigest()

    def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        start = time.monotonic()
        rows_in = rows_out = failures = 0
        for batch in batches:
            schema = batch.schema
            conv = batch.column(schema.get_field_index("conv_id"))
            turn = batch.column(schema.get_field_index("turn_idx"))
            texts = batch.column(schema.get_field_index("text")).to_pylist()
            rows_in += len(texts)
            extracted: list[Optional[str]] = []
            fails: list[Optional[str]] = []
            # spans build FLAT (offsets + three value arrays) — pyarrow
            # converts flat primitive lists far faster than nested
            # list-of-tuples (profiled ~half the wrapper overhead)
            offsets = [0]
            s_starts: list[int] = []
            s_ends: list[int] = []
            s_paths: list[str] = []
            for payload in texts:
                if row_fn is not None:
                    text, spans, failure = row_fn(payload)
                else:
                    text, spans, failure = extract_turn(payload, transformation)
                extracted.append(text)
                for s, e, p in spans:
                    s_starts.append(s)
                    s_ends.append(e)
                    s_paths.append(p)
                offsets.append(len(s_starts))
                fails.append(failure)
                if failure is not None:
                    failures += 1
            rows_out += len(texts)
            spans_arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.StructArray.from_arrays(
                    [
                        pa.array(s_starts, type=pa.int32()),
                        pa.array(s_ends, type=pa.int32()),
                        pa.array(s_paths, type=pa.string()),
                    ],
                    names=["start", "end", "path"],
                ),
            )
            out_arrays = [
                conv.cast(pa.string()),
                turn.cast(pa.int32()),
                pa.array(extracted, type=pa.string()),
                spans_arr,
                pa.array(fails, type=pa.string()),
            ]
            if passthrough_cols:
                yield pa.RecordBatch.from_arrays(
                    out_arrays
                    + [
                        batch.column(schema.get_field_index(c))
                        for c in passthrough_cols
                    ],
                    names=list(_OUT_ARROW.names) + list(passthrough_cols),
                )
            else:
                yield pa.RecordBatch.from_arrays(out_arrays, schema=_OUT_ARROW)
        if metrics_dir:
            _write_partition_metrics(
                metrics_dir, run_id, chunk_id, input_snapshot_id,
                rule_set_hash, rows_in, rows_out, failures,
                int((time.monotonic() - start) * 1000),
            )

    return extract_batches


def _write_partition_metrics(
    metrics_dir: str, run_id: str, chunk_id: int, input_snapshot_id: str,
    rule_set_hash: str, rows_in: int, rows_out: int, failures: int,
    wall_ms: int,
) -> None:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    record = {
        "run_id": run_id,
        "chunk_id": chunk_id,
        "partition_id": pid,
        "input_snapshot_id": input_snapshot_id,
        "rule_set_hash": rule_set_hash,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "failures": failures,
        "wall_ms": wall_ms,
    }
    os.makedirs(metrics_dir, exist_ok=True)
    final = os.path.join(metrics_dir, f"c{chunk_id:04d}-p{pid:05d}.json")
    tmp = os.path.join(metrics_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(record, fh)
    os.replace(tmp, final)  # atomic on POSIX; speculative retries
    # overwrite with identical deterministic content (except wall_ms)


def default_fanout_partitions(df: DataFrame) -> int:
    """Round-3 re-swept default for the per-row Python-UDF fan-out.

    Rule: ``cores`` (ONE wave of Python workers) when the input is at
    most two waves of files; the input's own file count — capped at
    32 waves — when it is bigger; ``max(cores,
    spark.sql.shuffle.partitions)`` when the plan is not file-backed
    (volume unknowable without running a job). The rule is
    parallelism-RELATIVE: the same input can resolve to one wave at
    high core counts and to the file layout at low ones — the
    adaptive default is part of the job, including in the N-vs-4N
    scaling evidence (each level runs its own default).

    Why, measured (BASELINE.md partition-count tables): fixed
    per-task + Python-worker-switch overhead dominates below ~25-50k
    turns/partition, so one wave beat the old 3x-cores default by
    28-55% on the 601k-turn tier; oversized partitions lose
    pipelining overlap and pay n·log n sort cost, worth ~8-10% back
    on the 2.4M-turn tier. Following the file layout on big inputs
    bounds partitions near the writer's granularity (at 100 TB,
    ~800k files → ~800k partitions, not total-cores partitions of
    30M turns). The probes here NEVER run a Spark job —
    ``inputFiles()`` is a listing; ``df.rdd.getNumPartitions()``
    (the round-3 first attempt) materializes every upstream shuffle
    stage under AQE, silently doubling a derived input's most
    expensive stages. Callers that know their row counts can pass
    ``num_partitions`` explicitly (~25-50k turns/partition is the
    sweet spot)."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())  # file listing — never a job
    except Exception:
        n_files = 0
    if n_files == 0:
        # non-file-backed plan (createDataFrame, pure-shuffle input):
        # keep the user-tuned shuffle floor — on a dynamic-allocation
        # cluster defaultParallelism can be tiny at session start
        return max(cores, _shuffle_floor(spark))
    if n_files <= 2 * cores:
        return cores  # small input: one wave, the measured winner
    # follow the file layout, but cap at 32 waves: file COUNT is not
    # split count — a streaming-written corpus of 100k tiny files must
    # not become 100k near-empty fan-out partitions (the per-task-
    # overhead regime the re-sweep removed); 32 waves bounds task
    # count while keeping partitions ≤ input-file granularity
    return min(n_files, 32 * cores)


def _shuffle_floor(spark) -> int:
    """User-tuned spark.sql.shuffle.partitions as an int, tolerating
    platforms that set it non-numerically (e.g. 'auto')."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except (ValueError, TypeError):
        return 32


def extract_df(
    df: DataFrame,
    transformation: Transformation = MAIN_CONTENT,
    num_partitions: Optional[int] = None,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    metrics_dir: Optional[str] = None,
    run_id: str = "",
    chunk_id: int = -1,
    input_snapshot_id: str = "",
    row_fn=None,
    passthrough_cols: tuple = (),
) -> DataFrame:
    """transcripts → extracted(conv_id, turn_idx, extracted_text,
    spans, failure[, *passthrough_cols]). Pure transformation —
    callers choose the sink. ``passthrough_cols`` (simple scalar
    source columns, e.g. ``("role",)``) ride the Arrow batch through
    the kernel hop 1:1, saving the full-corpus join-back a caller
    would otherwise need (see make_extract_fn)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = default_fanout_partitions(df)
    passthrough_cols = tuple(passthrough_cols)
    # round-5 advice: a passthrough column colliding with the fixed
    # output schema (or the key/text inputs) used to fail deep inside
    # mapInArrow with a confusing duplicate-field error — reject it
    # up front with the actual offender named
    reserved = {
        "conv_id", "turn_idx", "text",
        "extracted_text", "spans", "failure",
    }
    clash = [c for c in passthrough_cols if c in reserved]
    if clash:
        raise ValueError(
            f"passthrough_cols {clash} collide with the extraction "
            f"output schema / key columns {sorted(reserved)}"
        )
    fn = make_extract_fn(
        transformation, metrics_dir, run_id, chunk_id, input_snapshot_id,
        row_fn=row_fn, passthrough_cols=passthrough_cols,
    )
    out_schema = OUTPUT_SPARK_SCHEMA
    if passthrough_cols:
        out_schema += ", " + ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}"
            for c in passthrough_cols
        )
    pruned = df.select("conv_id", "turn_idx", "text", *passthrough_cols)
    salted = pruned.withColumn(
        "salt",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets)).cast("int"),
    )
    return (
        salted.repartition(num_partitions, "conv_id", "salt")
        .sortWithinPartitions("conv_id", "turn_idx")
        .drop("salt")
        .mapInArrow(fn, out_schema)
    )


def extract_df_deduped(
    df: DataFrame,
    transformation: Transformation = MAIN_CONTENT,
    num_partitions: Optional[int] = None,
    row_fn=None,
) -> DataFrame:
    """Dedup-before-extract: run the kernel over DISTINCT payloads
    only, then join results back to every (conv_id, turn_idx).

    The 10^12-turn lever: agent transcripts repeat payloads heavily
    (tool banners, templated turns, retried calls). Kernel compute
    scales with DISTINCT payloads while the join-back is pure JVM
    shuffle — profitable whenever the duplicate factor outweighs one
    exchange of the (fingerprint, results) table. Byte-identical to
    :func:`extract_df` by construction (same kernel per distinct
    payload; test-asserted).

    Plan shape::

        scan ─┬─ project (conv_id, turn_idx, fp=xxhash64(text))
              └─ distinct(fp, text) → repartition(fp) → mapInArrow
                   └────────── join on fp (both sides shuffle on fp)

    The key is a 128-bit md5 (32-char hex, 2^-128 collision odds —
    round 1 used a single xxhash64, where a collision is statistically
    EXPECTED at the 10^12-turn scale this targets and would assign one
    payload's results to another's rows). NULL texts map to the
    sentinel 'NULL', which can never collide with a 32-char digest.
    At 100 TB: AQE handles fp skew (the join IS a join, unlike the
    UDF fan-out in extract_df, so AQE's skew-join split applies); a
    super-hot fingerprint (billions of identical turns) is exactly the
    case where this variant wins biggest.
    """
    spark = df.sparkSession
    if num_partitions is None:
        # NOT the file-layout rule: this repartition carries the
        # DISTINCT payload set, whose size is unrelated to the raw
        # input's file count (billions of duplicate turns → thousands
        # of fingerprints; input-splits-many near-empty partitions
        # would reintroduce exactly the per-task overhead the
        # partition re-sweep removed)
        num_partitions = max(
            spark.sparkContext.defaultParallelism, _shuffle_floor(spark)
        )
    fp = F.coalesce(F.md5("text"), F.lit("NULL")).alias("fp")
    keyed = df.select("conv_id", "turn_idx", F.col("text"), fp)
    distinct = (
        keyed.select("fp", "text")
        .dropDuplicates(["fp"])
        .repartition(num_partitions, "fp")
    )
    fn = make_extract_fn(transformation, row_fn=row_fn)

    def extract_keep_fp(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            fps = batch.column(batch.schema.get_field_index("fp"))
            # reuse the kernel batch fn on a (conv_id, turn_idx, text)
            # shaped batch; conv_id/turn_idx are dummies here
            shaped = pa.RecordBatch.from_arrays(
                [
                    pa.array([""] * len(batch), type=pa.string()),
                    pa.array([0] * len(batch), type=pa.int32()),
                    batch.column(batch.schema.get_field_index("text")),
                ],
                names=["conv_id", "turn_idx", "text"],
            )
            for out in fn(iter([shaped])):
                yield pa.RecordBatch.from_arrays(
                    [
                        fps,
                        out.column(2),  # extracted_text
                        out.column(3),  # spans
                        out.column(4),  # failure
                    ],
                    names=["fp", "extracted_text", "spans", "failure"],
                )

    extracted_distinct = distinct.mapInArrow(
        extract_keep_fp,
        "fp string, extracted_text string, "
        "spans array<struct<start:int,end:int,path:string>>, failure string",
    )
    return (
        keyed.drop("text")
        .join(extracted_distinct, "fp")
        .drop("fp")
        .repartition(num_partitions, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "extracted_text", "spans", "failure")
    )
