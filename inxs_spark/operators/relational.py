"""Relational operators Spark lacks as single calls: as-of join and
small-dim range join (brief: "when the reference has an operator Spark
lacks (e.g., as-of join, range join), implement it as a composition of
existing DataFrame ops if semantics allow").

The reference library (funkyfuture/inxs) has no relational layer at
all (SURVEY.md §3.C [H]); these are engine extensions for the
training-data pipeline tier, built purely from DataFrame ops so
Catalyst plans them — no Python hop anywhere.

Scale notes
-----------
``asof_join`` is the union+window formulation: tag both inputs, union,
one window over the ``by`` keys ordered by the ``on`` column with a
last-non-null carry-forward, keep left rows. Exactly ONE shuffle (the
window's hash partitioning on ``by``), no per-key driver loop, no
range-bucketed self-join blowup. Skewed ``by`` keys are bounded by the
carry-forward being O(1) state per row; at 100 TB the window sort is
Tungsten-spillable. The classic alternative (theta join on
``l.on >= r.on`` + row_number) shuffles |L|×|R| candidate pairs per
key; this never materializes pairs.

``range_band_join`` broadcasts the (tiny) band table and lets Catalyst
pick BroadcastNestedLoopJoin — the right plan when one side is a
handful of range rows; never use it for two large sides.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    right_select: dict[str, str],
    allow_exact_match: bool = True,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.on <= left.on`` (or strictly ``<`` when
    ``allow_exact_match=False``) within the same ``by`` group; left
    rows with no prior right row keep NULLs (left-outer as-of,
    "backward" direction — pandas ``merge_asof`` semantics).

    ``right_select`` maps right column → output alias; all left
    columns pass through unchanged.
    """
    # Both sides ride ONE union: the right row's selected columns in
    # __asof_payload, the whole left row in __asof_left. No join-back,
    # no synthetic row ids — a single window pass produces the result.
    payload = F.struct(*[F.col(c) for c in right_select]).alias("__asof_payload")
    left_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left")
    # right rows sort BEFORE left rows at an equal `on` value when
    # exact matches count (marker 0 < 1), after them otherwise
    right_marker = 0 if allow_exact_match else 2
    l_tagged = left.select(
        F.col(by).alias("__asof_by"),
        F.col(on).alias("__asof_on"),
        F.lit(1).alias("__asof_marker"),
        left_struct,
    )
    r_tagged = right.select(
        F.col(by).alias("__asof_by"),
        F.col(on).alias("__asof_on"),
        F.lit(right_marker).alias("__asof_marker"),
        payload,
    )
    left_t = l_tagged.schema["__asof_left"].dataType
    right_t = r_tagged.schema["__asof_payload"].dataType
    l_tagged = l_tagged.withColumn("__asof_payload", F.lit(None).cast(right_t))
    r_tagged = r_tagged.withColumn("__asof_left", F.lit(None).cast(left_t))
    w = (
        Window.partitionBy("__asof_by")
        .orderBy("__asof_on", "__asof_marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_tagged.unionByName(l_tagged)
        .withColumn("__asof_match", F.last("__asof_payload", ignorenulls=True).over(w))
        .filter(F.col("__asof_marker") == 1)
    )
    out_cols = [F.col(f"__asof_left.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__asof_match.{src}").alias(alias)
        for src, alias in right_select.items()
    ]
    return matched.select(*out_cols)


def range_band_join(
    df: DataFrame,
    value_col: str,
    bands: list[tuple],
    band_cols: tuple[str, str, str] = ("band_id", "band_lo", "band_hi"),
    spark=None,
) -> DataFrame:
    """Join each row to the band with ``lo <= value < hi`` from a small
    in-memory band list (broadcast; BroadcastNestedLoopJoin — correct
    only because the band side is tiny)."""
    session = spark or df.sparkSession
    band_df = session.createDataFrame(bands, list(band_cols))
    lo, hi = band_cols[1], band_cols[2]
    cond = (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi))
    return df.join(F.broadcast(band_df), cond, "inner")


def time_bucket(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    out_col: str = "bucket_epoch",
) -> DataFrame:
    """Hypertable-style time bucketing: epoch-floored bucket start as a
    BIGINT (timezone-proof, hash-stable across engines)."""
    return df.withColumn(
        out_col,
        (
            F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
            * bucket_seconds
        ).cast("long"),
    )
