"""Agent-trajectory operator tests (operators/trajectories.py),
including an O(n)-serial-reference sweep over the synthetic
transcript generator so the distributed gaps-and-islands encoding is
pinned against a trivially-auditable loop."""

import datetime

from pyspark.sql import functions as F


_TS0 = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def _turns(spark, rows):
    """rows: (conv, idx, role, tool) — ts derived, text derived."""
    full = [
        (c, i, role, f"t{c}.{i}", tool, _TS0 + datetime.timedelta(seconds=i))
        for (c, i, role, tool) in rows
    ]
    return spark.createDataFrame(
        full,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_tool_call_runs_islands(spark):
    from inxs_spark.operators.trajectories import tool_call_runs

    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "tool", "search"),
        ("c1", 2, "tool", "search"),
        ("c1", 3, "tool", "fetch"),
        ("c1", 4, "assistant", None),
        ("c1", 5, "tool", "search"),   # new run: broken by non-tool turn
        ("c2", 0, "tool", "fetch"),
        ("c2", 1, "tool", "fetch"),
        ("c2", 2, "tool", "fetch"),
    ]
    got = {
        (r.conv_id, r.run_start_idx): (r.tool, r.run_end_idx, r.run_len)
        for r in tool_call_runs(_turns(spark, rows)).collect()
    }
    assert got == {
        ("c1", 1): ("search", 2, 2),
        ("c1", 3): ("fetch", 3, 1),
        ("c1", 5): ("search", 5, 1),
        ("c2", 0): ("fetch", 2, 3),
    }


def test_detect_tool_loops_threshold(spark):
    from inxs_spark.operators.trajectories import detect_tool_loops

    rows = [("c1", i, "tool", "retry") for i in range(4)] + [
        ("c2", 0, "tool", "a"),
        ("c2", 1, "tool", "b"),
        ("c2", 2, "tool", "a"),    # alternation is NOT a loop
    ]
    loops = detect_tool_loops(_turns(spark, rows), min_run=3).collect()
    assert [(r.conv_id, r.tool, r.run_len) for r in loops] == [("c1", "retry", 4)]


def test_tool_transitions_skip_nontool_turns(spark):
    from inxs_spark.operators.trajectories import tool_transition_counts

    rows = [
        ("c1", 0, "tool", "search"),
        ("c1", 1, "assistant", None),   # chat between calls still counts
        ("c1", 2, "tool", "fetch"),
        ("c1", 3, "tool", "fetch"),
        ("c2", 0, "tool", "search"),
        ("c2", 1, "tool", "fetch"),
    ]
    got = {
        (r.prev_tool, r.tool): r.n_transitions
        for r in tool_transition_counts(_turns(spark, rows)).collect()
    }
    assert got == {("search", "fetch"): 2, ("fetch", "fetch"): 1}


def test_trajectory_stats_one_aggregate(spark):
    from inxs_spark.operators.trajectories import trajectory_stats

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi", None, _TS0),
            ("c1", 1, "tool", "xxxx", "search",
             _TS0 + datetime.timedelta(seconds=30)),
            ("c1", 2, "assistant", "okokok", None,
             _TS0 + datetime.timedelta(seconds=90)),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    r = trajectory_stats(df).collect()[0]
    assert (r.n_turns, r.n_tool_calls, r.n_distinct_tools) == (3, 1, 1)
    assert (r.n_assistant_turns, r.n_user_turns) == (1, 1)
    assert r.duration_s == 90
    assert abs(r.assistant_text_share - 6 / 12) < 1e-9
    # plan shape: exactly one exchange (the groupBy), no window, no join
    plan = trajectory_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan and "Window" not in plan and "Join" not in plan


def test_runs_match_serial_reference_on_synth(spark, tiny_transcripts):
    """The distributed islands encoding equals a serial per-conv loop
    over the real synthetic transcript tier (tool runs broken by
    role turns, exact start/end/len)."""
    from inxs_spark.operators.trajectories import tool_call_runs

    turns = spark.read.parquet(tiny_transcripts)
    local = (
        turns.select("conv_id", "turn_idx", "role", "tool")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )

    expected = set()
    cur = None  # (conv, tool, start, end)
    for r in local:
        if cur is not None and (r.conv_id != cur[0] or r.tool != cur[1]):
            if cur[1] is not None:
                expected.add((cur[0], cur[1], cur[2], cur[3], cur[3] - cur[2] + 1))
            cur = None
        if cur is None:
            cur = (r.conv_id, r.tool, r.turn_idx, r.turn_idx)
        else:
            cur = (cur[0], cur[1], cur[2], r.turn_idx)
    if cur is not None and cur[1] is not None:
        expected.add((cur[0], cur[1], cur[2], cur[3], cur[3] - cur[2] + 1))

    got = {
        (r.conv_id, r.tool, r.run_start_idx, r.run_end_idx, r.run_len)
        for r in tool_call_runs(turns).collect()
    }
    assert got == expected
    assert len(got) > 0
