"""Custom stateful streaming operator: per-conversation progress
tracking with ``applyInPandasWithState`` (the brief's custom-stateful-
operator surface).

``conversation_progress`` maintains, per conv_id, the running turn
count, max turn_idx seen, and failure count over the extraction
stream; a processing-time timeout emits a final "closed" row when a
conversation goes quiet. This is the streaming analogue of a
conversation-level rollup that a batch job would do with groupBy —
but incremental, with bounded state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, max_turn_idx int, n_failures long"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, n_failures long, "
    "closed boolean"
)


def _make_update(close_after_ms: int):
    def _update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, max_idx, n_failures = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n_turns, max_idx, n_failures, True)],
                columns=["conv_id", "n_turns", "max_turn_idx", "n_failures", "closed"],
            )
            return
        n_turns, max_idx, n_failures = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            n_turns += len(pdf)
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
                n_failures += int(pdf["failure"].notna().sum())
        state.update((n_turns, max_idx, n_failures))
        if close_after_ms > 0:
            state.setTimeoutDuration(close_after_ms)
        yield pd.DataFrame(
            [(conv_id, n_turns, max_idx, n_failures, False)],
            columns=["conv_id", "n_turns", "max_turn_idx", "n_failures", "closed"],
        )

    return _update


def conversation_progress(
    extracted_stream: DataFrame, close_after_ms: int = 0
) -> DataFrame:
    """extracted (streaming) → running per-conversation progress rows.
    Input needs columns (conv_id, turn_idx, failure).

    ``close_after_ms > 0`` additionally emits a final closed=True row
    after a conversation goes quiet — CONTINUOUS streams only: with a
    drain trigger (availableNow) pending processing-time timeouts keep
    the query alive through hundreds of ~1s empty microbatches
    (measured), so the default leaves timeouts off."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if close_after_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        extracted_stream.select("conv_id", "turn_idx", "failure")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(close_after_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
