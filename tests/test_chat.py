"""Conversation assembly (pipeline/chat.py): ordering, template
rendering, keep-last budget truncation."""

from pyspark.sql import functions as F

from nested_pandas_spark.pipeline.chat import (
    assemble_conversations,
    render_template,
    truncate_to_budget,
)


def _conv(spark):
    rows = [
        # (conv, ts, seq, role, content)
        (1, 30, 0, "assistant", "fine thanks"),
        (1, 10, 0, "system", "be helpful"),
        (1, 20, 0, "user", "hi how are you"),
        (2, 5, 1, "user", "b"),
        (2, 5, 0, "user", "a"),  # ts tie -> seq breaks it
        (3, 1, 0, "user", None),  # NULL content renders empty, counts 0
    ]
    df = spark.createDataFrame(rows, "conv long, ts long, seq long, role string, content string")
    return assemble_conversations(df, "conv", "ts", "role", "content", tiebreak="seq")


def test_assembly_order_and_tiebreak(spark):
    out = {r["conv"]: r["turns"] for r in _conv(spark).collect()}
    assert [t["role"] for t in out[1]] == ["system", "user", "assistant"]
    assert [t["content"] for t in out[2]] == ["a", "b"]
    assert out[3][0]["content"] is None


def test_render_template(spark):
    out = _conv(spark).withColumn("txt", render_template("turns"))
    txt = {r["conv"]: r["txt"] for r in out.collect()}
    assert txt[1] == (
        "<|system|>\nbe helpful<|end|>\n"
        "<|user|>\nhi how are you<|end|>\n"
        "<|assistant|>\nfine thanks<|end|>"
    )
    assert txt[3] == "<|user|>\n<|end|>"


def test_truncate_keeps_most_recent(spark):
    conv = _conv(spark)
    kept, total = truncate_to_budget("turns", budget=6, out_tokens=True)
    out = {
        r["conv"]: (r["kept"], r["total"])
        for r in conv.select("conv", kept.alias("kept"), total.alias("total")).collect()
    }
    # conv 1 token counts: system=2, user=4, assistant=2 -> from the end:
    # assistant(2) + user(4) = 6 fits; adding system would be 8 > 6
    assert [t["role"] for t in out[1][0]] == ["user", "assistant"]
    assert out[1][1] == 6
    # conv 3: NULL content counts 0 tokens, still kept
    assert len(out[3][0]) == 1 and out[3][1] == 0


def test_truncate_budget_zero_and_oversized_first_turn(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, "user", "one two three four five")],
        "conv long, ts long, seq long, role string, content string",
    )
    conv = assemble_conversations(df, "conv", "ts", "role", "content")
    row = conv.select(
        truncate_to_budget("turns", budget=3).alias("kept")
    ).collect()[0]
    assert row["kept"] == []


def test_multi_key_grouping(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, "user", "x"), (1, "b", 1, "user", "y")],
        "u long, sess string, ts long, role string, content string",
    )
    out = assemble_conversations(df, ["u", "sess"], "ts", "role", "content")
    assert out.count() == 2
