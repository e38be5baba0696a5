"""Multi-turn conversation assembly for SFT / chat training data.

The reference engine stops at row-level transformation; a training-data
pipeline additionally needs to turn interaction LOGS (one row per
message/event) into one training SAMPLE per conversation: turns
gathered per conversation key, ordered deterministically, truncated to
a turn budget, and rendered through a chat template — the step that
sits between a sessionized event stream and the tokenizer/packer
(compose with functions/sampling.pack_sequences downstream).

Spark-first: the whole operator is built-in expressions —
``collect_list`` of a struct whose FIELD ORDER encodes the sort key,
``array_sort`` (lexicographic struct compare, JVM-side), ``slice`` for
the turn budget, and a ``transform``+``concat_ws`` render — so it is
one map-side-combined shuffle on the conversation key and zero Python.
An ANSI oracle replays it as row_number() + string_agg(ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: template name -> (per-turn format fn, turn separator)
_TEMPLATES = ("chatml", "plain")


def _render_turn(template: str, role: Column, text: Column) -> Column:
    role = F.coalesce(role.cast("string"), F.lit(""))
    text = F.coalesce(text.cast("string"), F.lit(""))
    if template == "chatml":
        return F.concat(
            F.lit("<|im_start|>"), role, F.lit("\n"), text,
            F.lit("<|im_end|>"),
        )
    if template == "plain":
        return F.concat(role, F.lit(": "), text)
    raise ValueError(f"unknown template {template!r}: {_TEMPLATES}")


def assemble_conversations(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    role_col: str = "role",
    text_col: str = "text",
    template: str = "chatml",
    max_turns: int | None = None,
    system_prompt: str | None = None,
) -> DataFrame:
    """One training sample per conversation: gather, order, truncate,
    render.

    - ``key_cols`` identify a conversation (e.g. ``[user_id]`` or a
      sessionize output's ``[user_id, session_id]``).
    - ``order_cols`` order turns WITHIN a conversation and must be a
      per-conversation unique key (e.g. ``[ts, event_id]``); rows with
      a NULL in any order column are dropped (their position is
      undefined — same contract as the window operators). Uniqueness
      makes the assembly bit-deterministic at any partitioning: the
      sort key is the struct prefix, so equal prefixes would fall back
      to comparing (role, text), which still ties only for fully
      identical turns.
    - ``max_turns`` keeps the FIRST n turns (context-window budget from
      the conversation's start; compose with chunk_documents for
      sliding windows).
    - ``template``: ``chatml`` renders ``<|im_start|>role\\ntext
      <|im_end|>`` per turn, newline-joined; ``plain`` renders
      ``role: text``. ``system_prompt`` prepends one synthetic system
      turn (not counted against ``max_turns``).

    Output: key_cols + (n_turns, n_chars, text) — n_turns counts KEPT
    turns, n_chars = length(text) of the rendered sample.

    Scale shape: ONE shuffle on the conversation key. With
    ``max_turns`` set, turns beyond the budget are dropped BEFORE the
    gather by a row_number window over the SAME key/order (the window
    sort and the aggregation share one exchange), so the per-group
    aggregation buffer is bounded by ``max_turns`` × turn size — a
    runaway conversation (a bot session with millions of events) never
    materializes past its budget. The window's ORDER BY replicates the
    struct compare array_sort applies (order cols, then role, then
    text, ascending nulls-first), so the kept set is exactly the
    sorted prefix. Conversation keys are high-cardinality by
    construction, so there is no skew funnel beyond the natural
    conversation length.
    """
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    if template not in _TEMPLATES:
        raise ValueError(f"unknown template {template!r}: {_TEMPLATES}")
    if max_turns is not None and max_turns < 1:
        raise ValueError("max_turns must be >= 1")

    keep = df
    for c in order_cols:
        keep = keep.filter(F.col(c).isNotNull())

    if max_turns is not None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*[F.col(c) for c in key_cols])
            .orderBy(
                *[F.col(c).asc() for c in order_cols],
                F.col(role_col).cast("string").asc(),
                F.col(text_col).cast("string").asc(),
            )
        )
        keep = (
            keep.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_turns)
            .drop("__rn")
        )

    # field order IS the sort key: order cols first, then role/text as
    # a deterministic tail (reached only on duplicate order values)
    turn = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(role_col).cast("string").alias("__role"),
        F.col(text_col).cast("string").alias("__text"),
    )
    turns = F.array_sort(F.collect_list(turn))

    rendered = F.concat_ws(
        "\n",
        F.transform(
            turns, lambda t: _render_turn(template, t["__role"], t["__text"])
        ),
    )
    if system_prompt is not None:
        head = _render_turn(
            template, F.lit("system"), F.lit(system_prompt)
        )
        rendered = F.concat(head, F.lit("\n"), rendered)

    agg = keep.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.size(turns).alias("n_turns"),
        rendered.alias("text"),
    )
    return agg.select(
        *key_cols,
        "n_turns",
        F.length("text").cast("bigint").alias("n_chars"),
        "text",
    )
