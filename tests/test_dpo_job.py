"""End-to-end tests for the DPO preference-pair export job
(jobs/dpo.py) over planted forked transcripts."""

import json
import os
import subprocess
import sys



def _forked_transcripts(spark):
    """Six conversations: f0..f3 share a 2-turn opener then diverge at
    turn 2 (f3's completion payload EQUALS f0's — raw duplicates);
    conv g is unforked; conv h ends at the shared prefix. Payloads are
    HTML so extraction actually transforms them."""
    opener = [
        "<doc><p>hello</p></doc>",
        "<doc><nav>menu</nav><p>how can I help</p></doc>",
    ]
    completions = {
        "f0": "<doc><p>answer alpha</p></doc>",
        "f1": "<doc><p>answer beta beta beta</p></doc>",
        "f2": "<doc><p>answer gamma gamma</p></doc>",
        "f3": "<doc><p>answer alpha</p></doc>",
    }
    rows = []
    for c in ("f0", "f1", "f2", "f3", "h"):
        for i, payload in enumerate(opener):
            rows.append((c, i, "user" if i == 0 else "assistant", payload))
    for c, payload in completions.items():
        rows.append((c, 2, "assistant", payload))
    rows += [
        ("g", 0, "user", "<doc><p>different opener</p></doc>"),
        ("g", 1, "assistant", "<doc><p>x</p></doc>"),
        ("g", 2, "assistant", "<doc><p>y</p></doc>"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_dpo_job_matches_direct_composition(spark):
    from inxs_spark.jobs.dpo import extract_preference_pairs
    from inxs_spark.operators.conversations import preference_pairs
    from inxs_spark.plans.extract_pipeline import extract_df

    turns = _forked_transcripts(spark)
    scores = spark.createDataFrame(
        [("f0", 0.1), ("f1", 0.9), ("f2", 0.5), ("f3", 0.3),
         ("g", 1.0), ("h", 1.0)],
        "conv_id string, score double",
    )
    pairs, stats = extract_preference_pairs(turns, k_turns=2, scores=scores)
    rows = pairs.collect()
    # one fork group (f0..f3 share the EXTRACTED opener; h has no
    # completion; g's prefix differs)
    assert len(rows) == 1
    r = rows[0]
    assert (r.chosen_conv_id, r.rejected_conv_id) == ("f1", "f0")
    assert r.n_candidates == 4
    assert r.chosen_text == "answer beta beta beta"
    assert r.rejected_text == "answer alpha"
    assert stats["pairs"] == 1 and stats["fork_candidates"] == 4
    assert stats["score_source"] == "provided"

    want = preference_pairs(
        extract_df(turns, passthrough_cols=("role",)), scores,
        k_turns=2, text_col="extracted_text",
    ).collect()
    assert [tuple(x) for x in want] == [tuple(x) for x in rows]
    spark.catalog.clearCache()


def test_dpo_job_heuristic_scores_deterministic(spark):
    """Default scoring (mean assistant-turn quality) picks a
    deterministic extreme pair; identical-completion extremes are
    dropped by the operator (f3 == f0 text can never form a pair)."""
    from inxs_spark.jobs.dpo import extract_preference_pairs

    turns = _forked_transcripts(spark)
    pairs, stats = extract_preference_pairs(turns, k_turns=2)
    rows = pairs.collect()
    assert stats["score_source"] == "heuristic"
    assert len(rows) <= 1
    if rows:
        assert rows[0].chosen_text != rows[0].rejected_text
    again = extract_preference_pairs(turns, k_turns=2)[0].collect()
    assert [tuple(x) for x in again] == [tuple(x) for x in rows]
    spark.catalog.clearCache()


def test_dpo_job_cli(spark, tmp_path):
    src = str(tmp_path / "turns")
    _forked_transcripts(spark).write.parquet(src)
    out = str(tmp_path / "dpoout")
    proc = subprocess.run(
        [sys.executable, "-m", "inxs_spark.jobs.dpo", "--input", src,
         "--out", out, "--k-turns", "2", "--master", "local[2]"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["input_turns"] == 17 and stats["k_turns"] == 2
    written = spark.read.parquet(os.path.join(out, "preference_pairs"))
    assert written.count() == stats["pairs"]
    assert {"chosen_text", "rejected_text"} <= set(written.columns)
