"""Doc assembly: stable turn ordering, placeholder exclusion, round-trip
per-turn text equality (the BASELINE.json input_hint invariant)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.fixtures import generate, to_spark
from repostcheckerbot_spark.operators.assembly import assemble_docs, assemble_docs_keep_turns, explode_docs


@pytest.fixture(scope="module")
def fx(spark):
    fixture = generate(n_conv=40, seed=7)
    transcripts, *_ = to_spark(spark, fixture)
    return fixture, transcripts


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_turn_order_is_turn_idx_not_row_order(spark):
    ts = datetime(2024, 1, 1)
    in_order = _mk(spark, [("c1", 0, "user", "alpha", "t", ts), ("c1", 1, "assistant", "beta", "t", ts)])
    reversed_rows = _mk(spark, [("c1", 1, "assistant", "beta", "t", ts), ("c1", 0, "user", "alpha", "t", ts)])
    a = assemble_docs(in_order).select("conv_id", "doc_text", "doc_sha").collect()[0]
    b = assemble_docs(reversed_rows).select("conv_id", "doc_text", "doc_sha").collect()[0]
    assert a.doc_text == "alpha\nbeta"
    assert a.doc_text == b.doc_text and a.doc_sha == b.doc_sha


def test_placeholder_turns_excluded_and_all_placeholder_conv_dropped(spark):
    ts = datetime(2024, 1, 1)
    df = _mk(
        spark,
        [
            ("c1", 0, "user", "hello", "t", ts),
            ("c1", 1, "assistant", "[removed]", "t", ts),
            ("c1", 2, "user", "world", "t", ts),
            ("c2", 0, "user", "&#x200B;", "t", ts),
            ("c2", 1, "assistant", "", "t", ts),
        ],
    )
    docs = assemble_docs(df)
    rows = {r.conv_id: r for r in docs.collect()}
    assert set(rows) == {"c1"}
    assert rows["c1"].doc_text == "hello\nworld"
    assert rows["c1"].n_turns == 2


def test_roundtrip_per_turn_text_equality(spark, fx):
    """Pipeline round-trip must preserve every turn's text byte-for-byte
    under stable (conv_id, turn_idx) ordering."""
    fixture, transcripts = fx
    back = explode_docs(assemble_docs_keep_turns(transcripts))
    orig = (
        transcripts.where(~F.col("text").isin("&#x200B;", "", "[removed]", "[deleted]"))
        .select("conv_id", "turn_idx", "text")
    )
    got = back.select("conv_id", "turn_idx", "text")
    assert orig.count() == got.count()
    # anti-join in both directions: empty ⇒ exact multiset equality on keys+text
    assert orig.join(got, ["conv_id", "turn_idx", "text"], "left_anti").count() == 0
    assert got.join(orig, ["conv_id", "turn_idx", "text"], "left_anti").count() == 0


def test_doc_sha_invariant_under_input_row_shuffle(spark, fx):
    fixture, transcripts = fx
    shuffled = transcripts.orderBy(F.rand(seed=3))
    a = assemble_docs(transcripts).select("conv_id", "doc_sha")
    b = assemble_docs(shuffled).select("conv_id", "doc_sha")
    assert a.join(b, ["conv_id", "doc_sha"], "inner").count() == a.count()


def test_role_sig_and_tool_blocking_columns(spark):
    ts = datetime(2024, 1, 1)
    df = _mk(
        spark,
        [
            ("c1", 0, "user", "a", "web", ts),
            ("c1", 1, "assistant", "b", "web", ts),
            ("c2", 0, "user", "a2", "web", ts),
            ("c2", 1, "assistant", "b2", "web", ts),
            ("c3", 0, "assistant", "a", "web", ts),
            ("c3", 1, "user", "b", "web", ts),
        ],
    )
    docs = assemble_docs(df).select("conv_id", "role_sig", "tool").collect()
    by_id = {r.conv_id: r for r in docs}
    assert by_id["c1"].role_sig == by_id["c2"].role_sig  # same role sequence
    assert by_id["c1"].role_sig != by_id["c3"].role_sig  # different order
    assert by_id["c1"].tool == "web"
