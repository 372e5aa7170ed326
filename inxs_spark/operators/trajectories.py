"""Agent-trajectory analytics over multi-turn transcripts — the
tool/role plane of the input table (conv_id, turn_idx, role, text,
tool, ts; BASELINE.json:15) the extraction plane never touches.

A standard curation step for agent-transcript training data is
dropping degenerate trajectories: an agent stuck re-invoking the same
tool, conversations that are all tool noise and no assistant text, or
trajectories whose tool-call mix marks them as synthetic replays.
These operators compute the signals those filters need with pure
column expressions and AT MOST one conv-keyed window pass each — no
Python, no self-joins, so the shapes survive 10^12 turns:

- ``tool_call_runs``: gaps-and-islands run-length encoding of
  consecutive same-tool turns (lag + conditional running sum, then
  ONE hash aggregate on the derived run key).
- ``detect_tool_loops``: runs of one tool at least ``min_run`` long —
  the degenerate-agent-loop filter.
- ``tool_transition_counts``: corpus-wide (prev_tool → tool) bigram
  counts over each conversation's tool-call subsequence.
- ``trajectory_stats``: per-conversation role/tool mix, wall-clock
  duration, and distinct-tool fan-out in ONE hash aggregate.

Upstream inxs has no transcript plane (the reference mount is empty;
SURVEY §0) — these are Spark-plane additions mandated by the
training-pipeline brief, sibling to conversations.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _run_key(tool_col: str, role_col: str):
    """Turns that are not tool calls still BREAK a tool run: a run is
    maximal only across consecutive turns of the SAME tool. Non-tool
    turns get a role-derived sentinel key (`<user>`, `<assistant>`)
    that can never collide with a tool name."""
    return F.coalesce(
        F.col(tool_col), F.concat(F.lit("<"), F.col(role_col), F.lit(">"))
    )


def tool_call_runs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Run-length encode consecutive same-tool turns per conversation
    (gaps-and-islands): one row per maximal run of tool calls, with
    its start/end turn index and length. Non-tool turns break runs
    and are not emitted.

    Scale shape: one window pass ordered by turn_idx within conv_id
    (the same exchange every conv-keyed operator in this package
    reuses) computing lag + a running sum of change flags — the
    island id — then ONE hash aggregate on (conv, island). State per
    row is two small columns; nothing quadratic, nothing Python.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    key = _run_key(tool_col, role_col)
    flagged = turns.select(
        F.col(conv_col), F.col(idx_col), F.col(tool_col).alias("__tool"),
        key.alias("__key"),
    ).withColumn(
        "__change",
        F.when(F.lag("__key").over(w).eqNullSafe(F.col("__key")), 0).otherwise(1),
    ).withColumn("__run", F.sum("__change").over(w))
    return (
        flagged.filter(F.col("__tool").isNotNull())
        .groupBy(conv_col, "__run")
        .agg(
            F.min(F.col("__tool")).alias("tool"),
            F.min(idx_col).alias("run_start_idx"),
            F.max(idx_col).alias("run_end_idx"),
            F.count("*").cast("long").alias("run_len"),
        )
        .drop("__run")
    )


def detect_tool_loops(
    turns: DataFrame,
    min_run: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Degenerate agent loops: maximal runs of ``min_run`` or more
    consecutive calls to the SAME tool. The canonical use is an
    anti-join key — drop (or down-weight) conversations whose agent
    got stuck retrying."""
    runs = tool_call_runs(turns, conv_col, idx_col, role_col, tool_col)
    return runs.filter(F.col("run_len") >= min_run)


def tool_transition_counts(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Corpus-wide tool-bigram counts: for each conversation's
    tool-call subsequence (non-tool turns removed FIRST, so 'search
    then fetch with chat in between' still counts as search→fetch),
    count (prev_tool, tool) transitions across the corpus. The
    trajectory-mix fingerprint used to spot synthetic replays and to
    weight tool-use sampling.

    One filtered window pass + one hash aggregate; the filter
    prunes non-tool rows BEFORE the exchange."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    seq = (
        turns.filter(F.col(tool_col).isNotNull())
        .select(F.col(conv_col), F.col(idx_col), F.col(tool_col))
        .withColumn("__prev", F.lag(tool_col).over(w))
    )
    return (
        seq.filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("prev_tool"), F.col(tool_col).alias("tool"))
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )


def trajectory_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation trajectory signals in ONE hash aggregate:
    turn/role/tool counts, distinct-tool fan-out, wall-clock duration,
    and the assistant-text share (chars produced by the assistant over
    total chars — all-tool-noise conversations score near 0)."""
    is_tool = F.col(tool_col).isNotNull()
    role = F.col(role_col)
    txt_len = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return turns.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(is_tool, 1).otherwise(0)).cast("long").alias("n_tool_calls"),
        F.countDistinct(F.col(tool_col)).cast("long").alias("n_distinct_tools"),
        F.sum(F.when(role == "assistant", 1).otherwise(0))
        .cast("long").alias("n_assistant_turns"),
        F.sum(F.when(role == "user", 1).otherwise(0))
        .cast("long").alias("n_user_turns"),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).cast("long").alias("duration_s"),
        F.round(
            F.sum(F.when(role == "assistant", txt_len).otherwise(0))
            / F.greatest(F.sum(txt_len), F.lit(1)),
            6,
        ).alias("assistant_text_share"),
    )
