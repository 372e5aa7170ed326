"""Examples + compat namespace tests (the reference's two canonical
example shapes, BASELINE.json:6)."""

import subprocess
import sys


def test_compat_namespace_is_complete():
    from inxs_spark import compat

    for symbol in compat.__all__:
        assert getattr(compat, symbol, None) is not None, symbol
    # the inxs-style one-liner works through compat alone
    t = compat.Transformation(
        compat.Rule("b", (compat.lib.get_text, compat.lib.put_variable("x"))),
        result_object="context.x",
    )
    assert t(compat.parse("<a><b>hit</b></a>")) == "hit"


def test_wikipedia_example_serial():
    proc = subprocess.run(
        [sys.executable, "examples/wikipedia_dumps.py"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.strip().splitlines()
    assert lines[0].startswith("Alpha:") and "first letter" in lines[0]
    assert "[1]" not in proc.stdout  # citations stripped
    assert "WikiProject" not in proc.stdout  # header stripped


def test_table_example_serial():
    proc = subprocess.run(
        [sys.executable, "examples/table_extraction.py"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    assert "('bolt', '7'" in proc.stdout
    assert "('nut', '3'" in proc.stdout


def test_training_pipeline_example():
    proc = subprocess.run(
        [sys.executable, "examples/training_pipeline.py", "--tier", "tiny",
         "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout.strip().splitlines()[-1]
    # deterministic corpus → deterministic summary line
    assert out == (
        "documents=9 turns=2008 tokens=38948 avg_tokens/doc=4327.6 "
        "seqs=55 full_seqs=51 packed_tokens=26767"
    ), out


def test_web_pipeline_example(tmp_path):
    import json

    proc = subprocess.run(
        [sys.executable, "examples/web_pipeline.py",
         "--out", str(tmp_path / "wc"), "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    # deterministic archives → deterministic per-stage lineage counts
    assert stats["pages_in"] == 96
    assert stats["pages_extracted"] == 93
    assert stats["pages_out"] == 76
    # counts are monotone non-increasing through the funnel
    funnel = [stats[k] for k in (
        "pages_in", "pages_after_url_dedup", "pages_extracted",
        "pages_after_line_cleanup", "pages_after_quality_gate",
        "pages_out")]
    assert funnel == sorted(funnel, reverse=True)
