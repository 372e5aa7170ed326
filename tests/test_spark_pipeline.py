"""Spark-plane tests (SURVEY.md §6.2 items 2-4): e2e kernel parity,
determinism across parallelism, resume exactness, lineage."""

import json
import os
import shutil

import pytest

from inxs_spark.extract import MAIN_CONTENT, extract_turn
from inxs_spark.plans.extract_pipeline import extract_df
from inxs_spark.plans.runner import (
    compact_metrics,
    pending_chunks,
    read_extracted,
    run_extraction,
)
from inxs_spark.sources import synth


def _serial_oracle():
    """The kernel applied serially in document order — the parity
    oracle while /root/reference is an empty mount (SURVEY.md §0)."""
    expected = {}
    for ordinal, length in synth.plan_conversations(synth.TIERS["tiny"]):
        cid = synth.conv_id(ordinal)
        for idx in range(length):
            text, spans, failure = extract_turn(synth.payload(ordinal, idx))
            expected[(cid, idx)] = (text, failure)
    return expected


def test_e2e_per_turn_text_equality(spark, tiny_transcripts):
    """THE north-rule invariant: per-turn extracted-text equality under
    stable (conv_id, turn_idx) ordering (BASELINE.json:14,15)."""
    df = spark.read.parquet(tiny_transcripts)
    rows = extract_df(df).collect()
    expected = _serial_oracle()
    assert len(rows) == len(expected)
    for r in rows:
        assert (r.extracted_text, r.failure) == expected[(r.conv_id, r.turn_idx)], (
            r.conv_id, r.turn_idx,
        )


def test_spans_land_in_extracted_text(spark, tiny_transcripts):
    df = spark.read.parquet(tiny_transcripts)
    for r in extract_df(df).limit(500).collect():
        if r.extracted_text is None:
            assert r.failure is not None
            continue
        for span in r.spans:
            assert 0 <= span.start < span.end <= len(r.extracted_text)
            assert span.path.startswith("/")


def _sorted_hash(df):
    from pyspark.sql import functions as F

    return (
        df.select("conv_id", "turn_idx", "extracted_text", "failure")
        .orderBy("conv_id", "turn_idx")
        .select(
            F.sha2(
                F.concat_ws(
                    "\x01",
                    "conv_id",
                    F.col("turn_idx").cast("string"),
                    F.coalesce("extracted_text", F.lit("\x02null")),
                    F.coalesce("failure", F.lit("\x02null")),
                ),
                256,
            ).alias("h")
        )
        .agg(F.sha2(F.concat_ws("", F.collect_list("h")), 256).alias("all"))
        .collect()[0].all
    )


def test_determinism_across_partitioning(spark, tiny_transcripts):
    """Same input at different parallelism / salt widths → identical
    sorted output hash (SURVEY.md §6.2 item 3)."""
    df = spark.read.parquet(tiny_transcripts)
    h1 = _sorted_hash(extract_df(df, num_partitions=2, salt_buckets=4))
    h2 = _sorted_hash(extract_df(df, num_partitions=16, salt_buckets=64))
    h3 = _sorted_hash(extract_df(df, num_partitions=7, salt_buckets=1))
    assert h1 == h2 == h3


def test_resume_recomputes_only_missing_chunks(spark, tiny_transcripts, tmp_out):
    summary1 = run_extraction(
        spark, tiny_transcripts, tmp_out, chunks=4, num_partitions=4
    )
    assert summary1["chunks_run"] == summary1["chunks_total"]
    full = {
        (r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
        for r in read_extracted(spark, tmp_out).collect()
    }

    # simulate partial loss: drop two chunks' data + manifests
    for k in (1, 3):
        shutil.rmtree(os.path.join(tmp_out, "extracted", f"chunk={k}"))
        os.remove(os.path.join(tmp_out, "manifests", f"chunk-{k:04d}.json"))

    assert pending_chunks(spark, tmp_out, summary1["chunks_total"]) == [1, 3]
    # marker files to detect recomputation of completed chunks
    untouched = {
        k: os.path.getmtime(os.path.join(tmp_out, "manifests", f"chunk-{k:04d}.json"))
        for k in (0, 2)
    }

    summary2 = run_extraction(
        spark, tiny_transcripts, tmp_out, chunks=4, num_partitions=4
    )
    assert summary2["chunks_run"] == 2 and summary2["chunks_skipped"] == 2
    for k, mtime in untouched.items():
        path = os.path.join(tmp_out, "manifests", f"chunk-{k:04d}.json")
        assert os.path.getmtime(path) == mtime  # not recomputed

    resumed = {
        (r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
        for r in read_extracted(spark, tmp_out).collect()
    }
    assert resumed == full  # exact resume (BASELINE.json:14)


def test_resume_rejects_incompatible_manifests(spark, tiny_transcripts, tmp_out):
    """Rerunning against completed manifests built with a different
    chunk count or rule set must fail loudly, not silently reuse
    manifests covering different file groups (round-2 resume gate)."""
    from inxs_spark.kernel import Rule, Transformation, lib
    from inxs_spark.plans.runner import ResumeMismatch

    run_extraction(spark, tiny_transcripts, tmp_out, chunks=4, num_partitions=2)
    with pytest.raises(ResumeMismatch, match="n_chunks"):
        run_extraction(spark, tiny_transcripts, tmp_out, chunks=2,
                       num_partitions=2)
    other_rules = Transformation(
        Rule("tr", (lib.get_text, lib.append("rows"))), name="other",
    )
    with pytest.raises(ResumeMismatch, match="rule_set_hash"):
        run_extraction(spark, tiny_transcripts, tmp_out, chunks=4,
                       num_partitions=2, transformation=other_rules)


def test_incremental_extraction_on_growing_input(spark, tiny_transcripts, tmp_out):
    """Append-corpus mode: new input files recompute only the groups
    they land in; the final table equals a full recompute."""
    from pyspark.sql import functions as F

    from inxs_spark.plans.runner import run_extraction_incremental

    src = os.path.join(tmp_out, "growing_input")
    base = spark.read.parquet(tiny_transcripts).limit(400)
    # repartition, not coalesce: coalesce cannot RAISE the partition
    # count, and a single-file input made this test flaky (all files
    # could hash into one group)
    base.repartition(4).write.mode("overwrite").parquet(src)

    s1 = run_extraction_incremental(spark, src, tmp_out, groups=4)
    assert s1["groups_run"] == s1["groups_total"]
    first = {(r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
             for r in read_extracted(spark, tmp_out).collect()}
    assert len(first) == 400

    # rerun without changes: everything skips
    s2 = run_extraction_incremental(spark, src, tmp_out, groups=4)
    assert s2["groups_run"] == 0 and s2["groups_skipped"] == s2["groups_total"]

    # append new rows (new parquet files) → only affected groups rerun
    extra = spark.createDataFrame(
        [("newconv", i, f"<p>appended {i}</p>") for i in range(5)],
        "conv_id string, turn_idx int, text string",
    ).withColumn("role", F.lit("user")).withColumn("tool", F.lit(None).cast("string")) \
     .withColumn("ts", F.current_timestamp()) \
     .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    extra.coalesce(1).write.mode("append").parquet(src)

    s3 = run_extraction_incremental(spark, src, tmp_out, groups=4)
    # exactly ONE file appended → exactly one group's fingerprint
    # changed → exactly one group reruns (group placement of the file
    # is hash-random, the rerun count is not)
    assert s3["groups_run"] == 1
    resumed = {(r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
               for r in read_extracted(spark, tmp_out).collect()}
    assert len(resumed) == 405
    assert resumed[("newconv", 0)] == ("appended 0", None)
    for key, val in first.items():
        assert resumed[key] == val  # untouched rows identical

    # rule change is still refused
    from inxs_spark.kernel import Rule, Transformation, lib
    from inxs_spark.plans.runner import ResumeMismatch

    other = Transformation(
        Rule("tr", (lib.get_text, lib.append("rows"))), name="other",
    )
    with pytest.raises(ResumeMismatch, match="rule_set_hash"):
        run_extraction_incremental(spark, src, tmp_out, groups=4,
                                   transformation=other)


def test_midjob_failure_then_resume(spark, tiny_transcripts, tmp_out, monkeypatch):
    """Driver-loss simulation WITHOUT manifest surgery: the job dies
    mid-run (injected failure on chunk 2); chunks committed before it
    keep their manifests, and the plain rerun recomputes ONLY the
    missing chunks, converging to the full result."""
    import inxs_spark.plans.runner as R

    src = os.path.join(tmp_out, "src")
    base = spark.read.parquet(tiny_transcripts).limit(300)
    base.repartition(3).write.mode("overwrite").parquet(src)

    orig = R.extract_df

    def boom(df, *a, **kw):
        if kw.get("chunk_id") == 2:
            raise RuntimeError("injected driver loss")
        return orig(df, *a, **kw)

    monkeypatch.setattr(R, "extract_df", boom)
    with pytest.raises(RuntimeError, match="injected driver loss"):
        run_extraction(spark, src, tmp_out, chunks=3, num_partitions=2)
    done_before = len(os.listdir(os.path.join(tmp_out, "manifests")))
    assert done_before == 2  # chunks 0 and 1 committed before the crash

    monkeypatch.setattr(R, "extract_df", orig)
    summary = run_extraction(spark, src, tmp_out, chunks=3, num_partitions=2)
    assert summary["chunks_skipped"] == 2 and summary["chunks_run"] == 1
    assert read_extracted(spark, tmp_out).count() == 300


def test_lineage_metrics(spark, tiny_transcripts, tmp_out):
    summary = run_extraction(
        spark, tiny_transcripts, tmp_out, chunks=2, num_partitions=4
    )
    metrics = spark.read.parquet(os.path.join(tmp_out, "metrics_table"))
    rows = metrics.collect()
    assert rows, "metrics table empty"
    total_in = sum(r.rows_in for r in rows)
    total_out = sum(r.rows_out for r in rows)
    n_input = spark.read.parquet(tiny_transcripts).count()
    assert total_in == total_out == n_input
    hashes = {r.rule_set_hash for r in rows}
    assert hashes == {MAIN_CONTENT.fingerprint()}
    snapshots = {r.input_snapshot_id for r in rows}
    assert snapshots == {summary["input_snapshot_id"]}
    # failures are counted (synthetic mix includes ~3% malformed)
    assert sum(r.failures for r in rows) > 0


def test_manifest_contents(spark, tiny_transcripts, tmp_out):
    run_extraction(spark, tiny_transcripts, tmp_out, chunks=2, num_partitions=2)
    with open(os.path.join(tmp_out, "manifests", "chunk-0000.json")) as fh:
        manifest = json.load(fh)
    assert manifest["status"] == "completed"
    assert manifest["rows_out"] > 0
    assert manifest["rule_set_hash"] == MAIN_CONTENT.fingerprint()
    assert manifest["output_fingerprint"].startswith("files-")


def test_deduped_pipeline_byte_identical(spark, tiny_transcripts):
    """extract_df_deduped must be indistinguishable from extract_df —
    same kernel, same rows, same spans — while computing each DISTINCT
    payload once."""
    from inxs_spark.plans.extract_pipeline import extract_df, extract_df_deduped

    df = spark.read.parquet(tiny_transcripts)
    key = lambda r: (r.conv_id, r.turn_idx)
    val = lambda r: (r.extracted_text, tuple(map(tuple, r.spans)), r.failure)
    a = {key(r): val(r) for r in extract_df(df).collect()}
    b = {key(r): val(r) for r in extract_df_deduped(df).collect()}
    assert a == b


def test_deduped_pipeline_on_duplicate_heavy_input(spark):
    """A corpus where one payload repeats 500x: results still per-turn
    correct (the 10^12-turn win case: kernel runs once per distinct)."""
    from inxs_spark.plans.extract_pipeline import extract_df_deduped

    rows = [("c%03d" % (i % 10), i // 10, "<p>same <b>body</b></p>")
            for i in range(500)]
    rows += [("unique", 0, "<article><nav>x</nav><p>only once</p></article>"),
             ("empty", 0, None),
             # literal 'NULL' text must NOT collide with the null-text
             # sentinel (sentinel is 4 chars, md5 keys are 32 — disjoint)
             ("nulltext", 0, "NULL")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")
    got = {(r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
           for r in extract_df_deduped(df).collect()}
    assert len(got) == 503
    assert got[("c000", 0)] == ("same body", None)
    assert got[("unique", 0)] == ("only once", None)
    assert got[("empty", 0)] == ("", None)
    assert got[("nulltext", 0)] == ("NULL", None)


def test_contract_deduped_equals_plain(spark, tiny_transcripts):
    """x_extract_deduped must match x_extract_transcripts row-for-row."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r.conv_id, r.turn_idx)
    a = {key(r): r.extracted_text for r in E.extra_queries()["x_extract_transcripts"](spark, sf).collect()}
    b = {key(r): r.extracted_text for r in E.extra_queries()["x_extract_deduped"](spark, sf).collect()}
    assert a == b


def test_default_fanout_partitions_rule(spark, tiny_transcripts, tmp_out):
    """The three branches + boundary of the fan-out default: one wave
    for ≤ 2-waves-of-files inputs, file layout (capped at 32 waves)
    beyond, shuffle-conf floor for non-file-backed plans."""
    from inxs_spark.plans.extract_pipeline import default_fanout_partitions

    cores = spark.sparkContext.defaultParallelism
    conf_floor = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # file-backed, few files → one wave of cores
    few = spark.read.parquet(tiny_transcripts)
    n_files = len(few.inputFiles())
    if n_files <= 2 * cores:
        assert default_fanout_partitions(few) == cores

    # many files (> 2*cores) → the file layout
    many_path = os.path.join(tmp_out, "many_files")
    spark.range(2 * cores + 8).repartition(2 * cores + 8).write.mode(
        "overwrite"
    ).parquet(many_path)
    many = spark.read.parquet(many_path)
    got = default_fanout_partitions(many)
    assert got == min(len(many.inputFiles()), 32 * cores)
    assert got > 2 * cores

    # non-file-backed plan → max(cores, shuffle conf), and never a job
    derived = spark.range(10).selectExpr("id")
    assert default_fanout_partitions(derived) == max(cores, conf_floor)


def test_transform_df_matches_serial_kernel(spark, tiny_transcripts):
    """Generic runner parity: Spark table-records output must equal the
    serial kernel applied per turn (same transformation object)."""
    from inxs_spark.kernel import Rule, Transformation, lib
    from inxs_spark.kernel.parse import ParseError, parse_payload
    from inxs_spark.plans.transform_pipeline import transform_df

    def row_cells(element):
        return tuple(c.full_text() for c in element.children)

    t = Transformation(
        Rule("tr", (row_cells, lib.append("rows"))),
        name="table-extraction", result_object="context.rows",
    )
    df = spark.read.parquet(tiny_transcripts)
    got = sorted(
        (r.conv_id, r.turn_idx, r.row_idx, tuple(r.cells))
        for r in transform_df(
            df, t, result_schema="row_idx int, cells array<string>",
            result_fn=lambda rows, _r: [
                {"row_idx": i, "cells": list(x)} for i, x in enumerate(rows or [])
            ],
        ).collect()
    )
    want = []
    for row in df.collect():
        try:
            root, _ = parse_payload(row.text)
            if root is None:
                continue
            result = t(root)  # raises when no <tr> matched (context.rows
            # unset) — the runner's on_error='skip' policy drops those
        except Exception:
            continue
        for i, cells in enumerate(result or []):
            want.append((row.conv_id, row.turn_idx, i, tuple(cells)))
    assert got == sorted(want) and got, (len(got), len(want))


def test_every_contract_query_analyzes(spark):
    """Bitrot guard for the driver contract: every queries() entry must
    at least pass Catalyst ANALYSIS at the tiny tier (resolves columns,
    types, UDF signatures — no execution). Full value checks run via
    tools/check_contract.py and the driver's oracle pass."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf)
            df.schema  # forces analysis
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            failures.append((name, repr(exc)[:200]))
    assert not failures, failures
    # every oracle key must have a matching query
    assert set(oracles) <= set(E.queries())


def test_contract_registry_within_driver_cap(spark):
    """The driver records at most the FIRST 50 queries() entries
    (CORRECTNESS_r03 was exactly the first 50 registry keys), so the
    contract registry must stay at ≤50 entries and EVERY entry must
    carry an oracle — otherwise a query silently loses its driver
    evidence. Demo/raw-output queries belong in extra_queries()."""
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) <= 50, (
        f"{len(qs)} contract queries — the driver only records the "
        "first 50; move demos to extra_queries()"
    )
    assert set(qs) == set(oracles), (
        set(qs) ^ set(oracles)
    )


def _exchange_outputs(df):
    """Attribute names carried by every (shuffle/broadcast) Exchange in
    the FINAL executed plan (AQE-resolved, so run an action first)."""
    df.write.format("noop").mode("overwrite").save()
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "Exchange" in name:
            attrs = [
                node.output().apply(i).name()
                for i in range(node.output().size())
            ]
            try:
                part = node.outputPartitioning().toString()
            except Exception:
                part = ""
            out.append((name, part, attrs))
        n = node.children().size()
        for i in range(n):
            walk(node.children().apply(i))
        # AQE wrapper nodes hide their child plan behind specific
        # accessors rather than children()
        for getter in ("executedPlan", "finalPhysicalPlan"):
            if hasattr(node, getter):
                try:
                    walk(getattr(node, getter)())
                except Exception:
                    pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_containment_exchanges_are_digest_only(spark):
    """containment_pairs at any tier must shuffle DIGESTS, never window
    or document text, across any KEYED exchange (round-3 verdict task 9
    plan assert). The one permitted text-bearing exchange is the
    round-6 compute fan-out: a ROUND-ROBIN repartition of a small
    file scan whose size guards (fanout.ensure_compute_fanout) cap it
    at provably-cheap inputs and disable it entirely at scale — keyed,
    data-proportional exchanges remain digest-only."""
    from inxs_spark.operators.text import containment_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ex = _exchange_outputs(containment_pairs(docs))
    assert ex, "expected at least one exchange"
    forbidden = {"text", "line", "__t", "__toks"}
    for name, part, attrs in ex:
        if "RoundRobinPartitioning" in part:
            continue  # the guarded fan-out; never fires at scale
        assert not (forbidden & set(attrs)), (name, part, attrs)


def test_boilerplate_exchanges_never_carry_documents(spark):
    """remove_boilerplate_lines: the frequency/anti-join side shuffles
    16-byte line digests only, and NO exchange ever carries the full
    document text column — the single allowed text-bearing exchange is
    the per-document reassembly groupBy, which moves individual
    SURVIVING lines (the documented shape)."""
    from inxs_spark.operators.text import remove_boilerplate_lines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ex = _exchange_outputs(remove_boilerplate_lines(docs, min_docs=5))
    assert ex, "expected at least one exchange"
    for name, part, attrs in ex:
        if "RoundRobinPartitioning" in part:
            continue  # round-6 guarded fan-out (see containment test)
        assert "text" not in attrs, (name, part, attrs)
    digest_ex = [
        attrs for _n, _p, attrs in ex
        if "line_md5" in attrs or any(a.startswith("n_docs") for a in attrs)
    ]
    assert any("line" not in attrs for attrs in digest_ex), ex


def test_custom_transformation_through_pipeline(spark, tiny_transcripts):
    """User rule-sets (not the fused preset) must run inside the Arrow
    UDF — including a transformation whose compiled-invoker caches are
    already WARM from local use (cloudpickle must carry the closures)."""
    from inxs_spark.kernel import Ref, Rule, Transformation, lib
    from inxs_spark.kernel.parse import parse_payload
    from inxs_spark.plans.extract_pipeline import extract_df

    custom = Transformation(
        [
            Rule("nav", (lib.append("trash", Ref("element")),)),
            Rule("footer", (lib.append("trash", Ref("element")),)),
        ],
        lib.remove_elements("trash"),
        name="custom-nav-footer-only",
        copy=False,
        result_object="tree",
    )
    # warm the caches locally BEFORE shipping to executors
    root, _ = parse_payload("<body><nav>m</nav><p>keep</p></body>")
    assert custom(root).full_text() == "keep"

    df = spark.read.parquet(tiny_transcripts).limit(300)
    rows = extract_df(df, transformation=custom).collect()
    assert rows
    # serial comparison with the same (already warm) transformation
    import inxs_spark.extract as X
    for r in rows[:100]:
        payload = df.filter(
            (df.conv_id == r.conv_id) & (df.turn_idx == r.turn_idx)
        ).collect()[0].text
        text, _s, fail = X.extract_turn(payload, custom)
        assert (r.extracted_text, r.failure) == (text, fail)


def test_transform_df_on_error_raise(spark):
    from inxs_spark.kernel import Rule, Transformation, lib
    from inxs_spark.plans.transform_pipeline import transform_df

    t = Transformation(
        Rule("tr", (lib.get_text, lib.append("rows"))),
        result_object="context.rows",
    )
    df = spark.createDataFrame(
        [("c1", 0, "<table><tr>x</tr></table>"), ("c1", 1, "<doc><broken")],
        "conv_id string, turn_idx int, text string",
    )
    # skip (default): the broken payload just disappears
    ok = transform_df(
        df, t, result_schema="cell string",
        result_fn=lambda rows, _r: [{"cell": str(r)} for r in (rows or [])],
    ).collect()
    assert len(ok) == 1
    # raise: the same input fails the job
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        transform_df(
            df, t, result_schema="cell string",
            result_fn=lambda rows, _r: [{"cell": str(r)} for r in (rows or [])],
            on_error="raise",
        ).collect()


def test_passthrough_cols_equal_join_back(spark, tiny_transcripts):
    """passthrough_cols carries source columns through the Arrow hop
    1:1: values equal the join-back formulation, and the plan contains
    NO join (the whole point — at scale the join-back is two more
    full-corpus shuffles)."""
    from pyspark.sql import functions as F

    from inxs_spark.plans.extract_pipeline import extract_df

    turns = spark.read.parquet(tiny_transcripts)
    through = extract_df(turns, passthrough_cols=("role", "tool"))
    assert through.columns[-2:] == ["role", "tool"]

    joined = extract_df(turns).join(
        turns.select("conv_id", "turn_idx", "role", "tool"),
        ["conv_id", "turn_idx"],
    )
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    got = {key(r): (r.extracted_text, r.failure, r.role, r.tool)
           for r in through.collect()}
    want = {key(r): (r.extracted_text, r.failure, r.role, r.tool)
            for r in joined.collect()}
    assert got == want and len(got) > 0

    plan = through._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # AQE prints final + initial sections; count the final one only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1  # the salt repartition only
