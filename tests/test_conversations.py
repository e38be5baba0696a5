"""assemble_conversations: SFT chat-sample assembly from event logs."""

import pytest
from pyspark.sql import functions as F

from greenmask_spark.functions.conversations import assemble_conversations


def _msgs(spark):
    rows = [
        # (conv, seq, role, text)
        (1, 1, "user", "hi"),
        (1, 2, "assistant", "hello!"),
        (1, 3, "user", "bye"),
        (2, 1, "user", "solo"),
        (3, 2, "assistant", None),   # NULL text renders as ""
        (3, 1, None, "who?"),        # NULL role renders as ""
        (4, None, "user", "dropped"),  # NULL order col -> dropped row
    ]
    return spark.createDataFrame(
        rows, "conv bigint, seq bigint, role string, text string"
    )


def test_chatml_render_and_order(spark):
    out = assemble_conversations(
        _msgs(spark), ["conv"], ["seq"], "role", "text"
    )
    got = {r["conv"]: r for r in out.collect()}
    assert got[1]["n_turns"] == 3
    assert got[1]["text"] == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello!<|im_end|>\n"
        "<|im_start|>user\nbye<|im_end|>"
    )
    assert got[1]["n_chars"] == len(got[1]["text"])
    # NULL role/text coalesce to "" but keep their turns
    assert got[3]["n_turns"] == 2
    assert got[3]["text"] == (
        "<|im_start|>\nwho?<|im_end|>\n"
        "<|im_start|>assistant\n<|im_end|>"
    )
    # the NULL-order row vanishes with its conversation's only turn
    assert 4 not in got


def test_plain_template_and_system_prompt(spark):
    out = assemble_conversations(
        _msgs(spark), ["conv"], ["seq"], "role", "text",
        template="plain", system_prompt="be brief",
    )
    got = {r["conv"]: r for r in out.collect()}
    assert got[2]["text"] == "system: be brief\nuser: solo"
    # system turn is NOT counted against n_turns
    assert got[2]["n_turns"] == 1


def test_max_turns_truncates_from_start(spark):
    out = assemble_conversations(
        _msgs(spark), ["conv"], ["seq"], "role", "text", max_turns=2
    )
    got = {r["conv"]: r for r in out.collect()}
    assert got[1]["n_turns"] == 2
    assert got[1]["text"].endswith("hello!<|im_end|>")
    assert "bye" not in got[1]["text"]


def test_partitioning_invariance(spark):
    df = _msgs(spark)
    a = assemble_conversations(df.coalesce(1), ["conv"], ["seq"])
    b = assemble_conversations(df.repartition(7, "text"), ["conv"], ["seq"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_validation_errors(spark):
    df = _msgs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        assemble_conversations(df, [], ["seq"])
    with pytest.raises(ValueError, match="template"):
        assemble_conversations(df, ["conv"], ["seq"], template="llama")
    with pytest.raises(ValueError, match="max_turns"):
        assemble_conversations(df, ["conv"], ["seq"], max_turns=0)


def test_plan_shape_one_shuffle_no_python(spark):
    df = _msgs(spark)
    for kwargs in ({}, {"max_turns": 2}):
        out = assemble_conversations(df, ["conv"], ["seq"], **kwargs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the max_turns window pre-filter shares the groupBy exchange
        assert plan.count("Exchange") <= 1, kwargs
        assert "Python" not in plan, kwargs  # pure built-in expressions


def test_max_turns_prefilter_matches_unbounded_prefix(spark):
    # the window pre-filter must keep EXACTLY the sorted prefix the
    # post-gather slice would have kept, including on order ties
    rows = [(1, 1, "a", "t1"), (1, 1, "b", "t2"), (1, 2, "c", "t3"),
            (2, 5, "x", "y")]
    df = spark.createDataFrame(
        rows, "conv bigint, seq bigint, role string, text string"
    )
    capped = assemble_conversations(df, ["conv"], ["seq"], max_turns=2)
    got = {r["conv"]: r["text"] for r in capped.collect()}
    # tie on seq=1 breaks on role: 'a' before 'b'
    assert got[1] == (
        "<|im_start|>a\nt1<|im_end|>\n<|im_start|>b\nt2<|im_end|>"
    )
