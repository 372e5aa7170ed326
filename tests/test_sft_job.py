"""End-to-end tests for the SFT dataset-assembly job (jobs/sft.py)."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F


def test_assemble_sft_dataset_matches_direct_composition(spark, tiny_transcripts):
    """The job seam equals composing the operators directly, and the
    loop filter actually removes every flagged conversation."""
    from inxs_spark.jobs.sft import assemble_sft_dataset
    from inxs_spark.operators.conversations import assemble_sft_examples
    from inxs_spark.operators.trajectories import detect_tool_loops
    from inxs_spark.plans.extract_pipeline import extract_df

    turns = spark.read.parquet(tiny_transcripts)
    got, stats = assemble_sft_dataset(turns, budget=32, drop_loops_min_run=2)

    loop_convs = {
        r.conv_id
        for r in detect_tool_loops(turns, min_run=2).select("conv_id").collect()
    }
    direct_src = (
        extract_df(turns)
        .join(turns.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"])
        .filter(~F.col("conv_id").isin(list(loop_convs)) if loop_convs else F.lit(True))
    )
    want = assemble_sft_examples(direct_src, 32, text_col="extracted_text")

    key = ["conv_id", "target_idx"]
    got_rows = {tuple(r[k] for k in key): (r.n_history_turns, r.history_tokens,
                                           r.history_text)
                for r in got.collect()}
    want_rows = {tuple(r[k] for k in key): (r.n_history_turns, r.history_tokens,
                                            r.history_text)
                 for r in want.collect()}
    assert got_rows == want_rows and len(got_rows) > 0

    assert not loop_convs & {k[0] for k in got_rows}
    assert stats["convs_dropped_as_loops"] == len(loop_convs)
    assert stats["examples"] == len(got_rows)
    assert stats["token_unit"] == "whitespace"
    assert set(stats["stage_walls_s"]) == {"extract_and_filter", "assemble"}
    spark.catalog.clearCache()


def test_sft_job_cli_writes_parquet_and_stats(spark, tmp_path):
    out = str(tmp_path / "sftout")
    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.jobs.sft", "--tier", "tiny",
         "--out", out, "--budget", "16", "--master", "local[2]",
         "--drop-loops", "3"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["examples"] > 0 and stats["budget"] == 16
    written = spark.read.parquet(os.path.join(out, "sft_examples"))
    assert written.count() == stats["examples"]
    assert "history_text" in written.columns
