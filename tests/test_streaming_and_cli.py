"""Streaming parity + CLI + packaging tests."""

import json
import os
import subprocess
import sys
import zipfile


def test_streaming_extract_matches_batch(spark, tiny_transcripts, tmp_out):
    from inxs_spark.plans.extract_pipeline import extract_df
    from inxs_spark.streaming.extract_stream import streaming_extract

    query = streaming_extract(spark, tiny_transcripts, tmp_out, available_now=True)
    query.awaitTermination(300)
    stream_out = spark.read.parquet(os.path.join(tmp_out, "extracted_stream"))
    batch_out = extract_df(spark.read.parquet(tiny_transcripts))
    s = {(r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
         for r in stream_out.collect()}
    b = {(r.conv_id, r.turn_idx): (r.extracted_text, r.failure)
         for r in batch_out.collect()}
    assert s == b  # batch/stream structural parity


def test_streaming_windowed_counts(spark, tiny_transcripts, tmp_out):
    from inxs_spark.streaming.extract_stream import streaming_turn_rates

    agg = streaming_turn_rates(spark, tiny_transcripts)
    query = (
        agg.writeStream.format("memory")
        .queryName("turn_rates_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_out, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    rows = spark.sql("select * from turn_rates_test").collect()
    assert rows
    assert {r.role for r in rows} <= {"user", "assistant", "tool"}
    total = sum(r.n_turns for r in rows)
    # watermark closes only windows older than max_event_time - 2min;
    # the trailing windows stay open in append mode, so total ≤ input
    n_input = spark.read.parquet(tiny_transcripts).count()
    assert 0 < total <= n_input


def test_kernel_cli_roundtrip(tmp_out):
    doc = os.path.join(tmp_out, "doc.xml")
    with open(doc, "w") as fh:
        fh.write("<article><header>nav</header><p>Body <ref>x</ref>text.</p></article>")
    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.kernel.cli", doc, "--text-only"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == "Body text."

    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.kernel.cli", doc, "--spans"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    payload = json.loads(proc.stdout)
    assert payload["extracted_text"] == "Body text."
    assert payload["failure"] is None
    assert payload["spans"][0]["path"].startswith("/article")

    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.kernel.cli", doc],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.stdout.strip() == "<article><p>Body text.</p></article>"


def test_package_zip_importable(tmp_out):
    from tools.package import build

    out = build(os.path.join(tmp_out, "inxs_spark.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "inxs_spark/__init__.py" in names
    assert "inxs_spark/kernel/transformation.py" in names
    # the zip must be importable standalone (spark-submit --py-files)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "from inxs_spark.extract import extract_turn; "
         "print(extract_turn('<p>ok</p>')[0])", out],
        capture_output=True, text=True,
    )
    assert proc.stdout.strip() == "ok"


def test_jobs_extract_cli(tmp_out):
    out_dir = os.path.join(tmp_out, "job_out")
    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.jobs.extract",
         "--tier", "tiny", "--out", out_dir, "--master", "local[2]",
         "--chunks", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["chunks_run"] == 2
    assert os.path.isdir(os.path.join(out_dir, "extracted"))
