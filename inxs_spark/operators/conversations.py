"""Conversation-level operators over extracted turns — the payload
domain's canonical rollups (multi-turn transcripts, BASELINE.json:15).

All pure JVM: order-sensitive reconstruction uses
``array_sort(collect_list(struct(turn_idx, ...)))`` — sorting the
struct array by its leading field — instead of a window + second
aggregation, so each operator is ONE hash-aggregate shuffle on
conv_id. At 10^12 turns this is the cheapest possible shape; giant
conversations are bounded (≤2000 turns) so per-group state stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_documents(
    extracted: DataFrame, sep: str = "\n", role_col: str | None = None
) -> DataFrame:
    """(conv_id, turn_idx, extracted_text[, role]) → one document per
    conversation with turns in order: the conversation-level training
    document."""
    cols = [F.col("turn_idx")]
    if role_col:
        cols.append(F.col(role_col))
    cols.append(F.coalesce(F.col("extracted_text"), F.lit("")).alias("t"))
    packed = F.struct(*cols)
    agg = extracted.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(packed)).alias("turns")
    )
    if role_col:
        text = F.expr(
            f"array_join(transform(turns, s -> concat(s.{role_col}, ': ', s.t)), '{sep}')"
        )
    else:
        text = F.expr(f"array_join(transform(turns, s -> s.t), '{sep}')")
    return agg.select(
        "conv_id",
        F.size("turns").cast("long").alias("n_turns"),
        text.alias("conv_text"),
    )


def conversation_stats(extracted: DataFrame) -> DataFrame:
    return extracted.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.when(F.col("failure").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_failures"),
        F.sum(F.length(F.coalesce("extracted_text", F.lit(""))))
        .cast("long").alias("total_chars"),
    )


def conversation_prefix_groups(
    extracted: DataFrame,
    k_turns: int = 3,
    text_col: str = "extracted_text",
) -> DataFrame:
    """Forked-conversation detection: conversations sharing their
    first ``k_turns`` turns byte-for-byte (retry spam, A/B forks,
    template openers — the transcript-corpus analogue of URL-prefix
    dup). Output: (prefix_md5, n_convs, keep_conv_id) for groups of
    ≥2 conversations, keyed by the digest of the IN-ORDER first k
    turns.

    Aggregation state is BOUNDED at k turns per conversation
    (round-3 verdict task 6): a row_number ≤ k window pre-filter keeps
    only the k lowest (turn_idx, text) rows per conv before any
    collect_list, so a 2000-turn conversation contributes k rows of
    state instead of its whole text (~600× less at k=3). The window's
    sort is disk-spillable; ordering (turn_idx, then text as the
    duplicate-turn_idx tiebreak) matches the previous
    array_sort-inside-aggregation semantics exactly, which the oracle
    hash re-pins. Conversations with fewer than k turns key on what
    they have, so a short conversation that IS another's prefix groups
    with it only when both have the same turn count (prefix equality,
    not containment — containment needs a second pass over group
    members)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "t")
    first_k = (
        extracted.select(
            "conv_id", "turn_idx",
            F.coalesce(F.col(text_col), F.lit("")).alias("t"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_turns)
        .drop("__rn")
    )
    # chr(1) delimiter: unambiguous in real text (turns can contain
    # newlines, so '\n' would alias turn boundaries)
    prefix = F.expr(
        f"array_join(transform(slice(array_sort(collect_list(turns_packed)), 1, {k_turns}),"
        " s -> s.t), chr(1))"
    )
    return (
        first_k.select(
            "conv_id", F.struct("turn_idx", "t").alias("turns_packed")
        )
        .groupBy("conv_id")
        .agg(prefix.alias("__prefix"))
        .select(F.md5("__prefix").alias("prefix_md5"), "conv_id")
        .groupBy("prefix_md5")
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.min("conv_id").alias("keep_conv_id"),
        )
        .filter(F.col("n_convs") > 1)
    )


def conversation_dup_groups(extracted: DataFrame) -> DataFrame:
    """Conversation-level exact dedup: identical reconstructed
    documents (boilerplate-stripped) → groups. Composes
    conversation_documents with the digest-keyed dedup shape."""
    docs = conversation_documents(extracted)
    return (
        docs.select(F.md5("conv_text").alias("fp_md5"), "conv_id")
        .groupBy("fp_md5")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("conv_id").alias("keep_conv_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def sft_example_index(
    turns: DataFrame,
    max_history_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    tokenizer=None,
) -> DataFrame:
    """One training-example row per ``target_role`` turn: the example's
    history is the LONGEST SUFFIX of prior turns whose token total
    fits ``max_history_tokens`` — the canonical SFT context-window
    assembly over multi-turn transcripts. Tokens are whitespace splits
    by default; pass ``tokenizer=`` (a trained
    ``operators.tokenizer.BpeTokenizer``) to budget in REAL subword
    tokens instead — the same opt-in seam ``pack_sequences`` has, one
    Arrow hop for the counts, every window unchanged. An empty/null
    turn counts as 1 token on both paths, preserving the
    strictly-increasing-prefix-sum invariant the RANGE frame needs.

    Pure JVM, two windows, no self-join and no Python: per-turn token
    counts are always ≥ 1 (split('') yields one element), so the
    running prefix sum ``cumprev`` (tokens BEFORE each turn) is
    STRICTLY increasing within a conversation — which turns the
    budget search into a RANGE frame: ordering by cumprev,
    ``RANGE BETWEEN max_history_tokens PRECEDING AND CURRENT ROW``
    holds exactly the maximal fitting suffix plus the current turn
    (including one more turn would overshoot the budget by the frame
    bound; every held turn fits by the same bound). count-1 is the
    history length, cumprev - min(cumprev) the history tokens,
    min(idx) the history start. O(n log n) per conversation, fully
    spillable, and replayable verbatim in any engine with numeric
    RANGE frames (the q_sft_examples oracle does, in DuckDB)."""
    from pyspark.sql.window import Window

    # coalesce BEFORE split: size(split(NULL)) is NULL/-1, which would
    # break the strictly-increasing-prefix-sum invariant the RANGE
    # frame depends on; a null turn counts like an empty one (1 token)
    if tokenizer is not None:
        tok = F.greatest(
            F.size(
                tokenizer.tokens_col(F.coalesce(F.col(text_col), F.lit("")))
            ),
            F.lit(1),
        ).cast("long")
    else:
        tok = F.size(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).cast("long")
    w_idx = Window.partitionBy(conv_col).orderBy(idx_col)
    cumprev = F.coalesce(
        F.sum("__tok").over(
            w_idx.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("long")
    t = turns.withColumn("__tok", tok).withColumn("__cumprev", cumprev)
    w_rng = (
        Window.partitionBy(conv_col)
        .orderBy("__cumprev")
        .rangeBetween(-max_history_tokens, 0)
    )
    return (
        t.withColumn("__n_frame", F.count("*").over(w_rng))
        .withColumn("__min_cumprev", F.min("__cumprev").over(w_rng))
        .withColumn("__start_idx", F.min(idx_col).over(w_rng))
        .filter(F.col(role_col) == target_role)
        .select(
            F.col(conv_col),
            F.col(idx_col).alias("target_idx"),
            (F.col("__n_frame") - 1).cast("long").alias("n_history_turns"),
            F.when(F.col("__n_frame") > 1, F.col("__start_idx"))
            .alias("history_start_idx"),
            (F.col("__cumprev") - F.col("__min_cumprev"))
            .cast("long")
            .alias("history_tokens"),
            F.col("__tok").alias("target_tokens"),
        )
    )


def assemble_sft_examples(
    turns: DataFrame,
    max_history_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    sep: str = "\n",
    tokenizer=None,
) -> DataFrame:
    """Materialize the history TEXT for every :func:`sft_example_index`
    row.

    Round-6 linearized shape (round-5 verdict task 2): aggregate each
    conversation ONCE into a sorted ``(turn_idx, text)`` array (the
    ``conversation_documents`` shape), join every example to that ONE
    row, and carve ``[history_start_idx, target_idx)`` out of the
    array with JVM ``filter``/``transform`` expressions. The previous
    shape fanned the conv-key equi-join out to (examples × turns)
    intermediate ROWS per conversation — ~n²/2 rows for long mostly-
    assistant conversations, of which most were filtered — and then
    paid a SECOND exchange re-aggregating the survivors per example.
    Now the join output is one row per example and the post-join work
    is expression-only: no aggregation above the join, no exchange
    proportional to Σ history sizes. Both join inputs are already
    hash-partitioned by the conversation key (the index's windows and
    the turns aggregation), so the join itself adds no exchange
    either. Output is row-identical (same [start, target) members in
    the same idx order — pinned by the q_sft_examples oracle and
    test_linearized_matches_fanout_shape)."""
    idx = sft_example_index(
        turns, max_history_tokens, conv_col, idx_col, role_col,
        text_col, target_role, tokenizer=tokenizer,
    )
    conv_turns = turns.groupBy(conv_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(idx_col).alias("__hist_idx"),
                    # same null rule as the index: a null turn is an
                    # empty line (array_join would silently DROP a null
                    # element, making the text disagree with the
                    # 1-token accounting)
                    F.coalesce(F.col(text_col), F.lit("")).alias("__hist_text"),
                )
            )
        ).alias("__turns")
    )
    assembled = (
        idx.filter(F.col("n_history_turns") > 0)
        .join(conv_turns, conv_col)
        .withColumn(
            "history_text",
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("__turns"),
                        lambda s: (s["__hist_idx"] >= F.col("history_start_idx"))
                        & (s["__hist_idx"] < F.col("target_idx")),
                    ),
                    lambda s: s["__hist_text"],
                ),
                sep,
            ),
        )
        .drop("__turns")
    )
    empties = idx.filter(F.col("n_history_turns") == 0).withColumn(
        "history_text", F.lit("")
    )
    return assembled.unionByName(empties)


def preference_pairs(
    turns: DataFrame,
    scores: DataFrame,
    k_turns: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    score_col: str = "score",
) -> DataFrame:
    """DPO/RLHF preference-pair extraction from forked transcripts:
    conversations sharing their first ``k_turns`` turns byte-for-byte
    (the :func:`conversation_prefix_groups` key) fork into candidate
    completions at the first divergent position; within each fork
    group the highest-scoring completion becomes ``chosen`` and the
    lowest ``rejected`` (score ties broken by conv id — fully
    deterministic), provided the two texts actually differ (identical
    completions carry no preference signal and are dropped).
    ``scores`` is a (conv_col, score_col) frame — a reward-model
    output, human rating, or heuristic.

    Bounded state end-to-end: the row_number ≤ k+1 prefilter keeps
    k+1 rows per conversation before any aggregation (the
    conversation_prefix_groups discipline), the scores join is
    conv-keyed, and the fork-group aggregation holds TWO structs per
    group (max/min over (score, conv_id, text)) however many
    candidates fork from one prefix."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col, "t")
    first = (
        turns.select(
            F.col(conv_col),
            F.col(idx_col),
            F.coalesce(F.col(text_col), F.lit("")).alias("t"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_turns + 1)
    )
    packed = F.struct(F.col(idx_col), F.col("t"))
    per_conv = (
        first.select(F.col(conv_col), packed.alias("turns_packed"))
        .groupBy(conv_col)
        .agg(
            F.expr(
                f"array_join(transform(slice(array_sort("
                f"collect_list(turns_packed)), 1, {k_turns}),"
                " s -> s.t), chr(1))"
            ).alias("__prefix"),
            # the completion: the (k+1)-th row in prefix order, null
            # for conversations that end at the shared prefix
            F.expr(
                f"try_element_at(transform(slice(array_sort("
                f"collect_list(turns_packed)), {k_turns + 1}, 1),"
                " s -> s.t), 1)"
            ).alias("__completion"),
        )
        .filter(F.col("__completion").isNotNull())
        .select(
            F.md5("__prefix").alias("prefix_md5"),
            F.col(conv_col),
            F.col("__completion"),
        )
    )
    cand = per_conv.join(
        scores.select(F.col(conv_col), F.col(score_col).alias("__score")),
        conv_col,
    )
    ranked = F.struct(
        F.col("__score"), F.col(conv_col), F.col("__completion")
    )
    return (
        cand.groupBy("prefix_md5")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.max(ranked).alias("__hi"),
            F.min(ranked).alias("__lo"),
        )
        .filter(
            (F.col("n_candidates") >= 2)
            & (F.col("__hi.__completion") != F.col("__lo.__completion"))
        )
        .select(
            "prefix_md5",
            "n_candidates",
            F.col(f"__hi.{conv_col}").alias("chosen_conv_id"),
            F.col("__hi.__score").alias("chosen_score"),
            F.col("__hi.__completion").alias("chosen_text"),
            F.col(f"__lo.{conv_col}").alias("rejected_conv_id"),
            F.col("__lo.__score").alias("rejected_score"),
            F.col("__lo.__completion").alias("rejected_text"),
        )
    )
