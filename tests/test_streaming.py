"""Structured Streaming wrapper: file-drop source → foreachBatch pipeline."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.sinks.state import Warehouse
from repostcheckerbot_spark.streaming.stream import read_transcript_stream, start_pipeline_stream

TS = datetime(2024, 1, 1)
BASE = ["streaming conversation about spark and reposts " * 3, "the assistant answers in detail here " * 3]


def _pdf(conv_id, texts, ts):
    import pandas as pd

    return pd.DataFrame(
        [
            dict(conv_id=conv_id, turn_idx=i, role="user" if i % 2 == 0 else "assistant", text=t, tool="web", ts=ts + timedelta(seconds=i))
            for i, t in enumerate(texts)
        ]
    )


@pytest.mark.slow
def test_stream_available_now_end_to_end(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    spark.createDataFrame(_pdf("s_orig", BASE, TS), schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "drop1")
    )
    spark.createDataFrame(_pdf("s_repost", BASE, TS + timedelta(days=1)), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "drop2"))

    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream = read_transcript_stream(spark, str(src / "drop*"))
    q = start_pipeline_stream(stream, wh, PipelineConfig(), str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert not q.isActive
    clusters = {r.conv_id: r.cluster_id for r in wh.read("clusters").collect()}
    assert clusters["s_orig"] == clusters["s_repost"]
    assert wh.read("edges").count() >= 1


@pytest.mark.slow
def test_sessionize_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): a conversation is
    emitted as one assembled doc only after it has been QUIET past the gap in
    event time. Turns split across micro-batches/restarts land in one session
    (state survives via the checkpoint); order is by turn_idx, not arrival."""
    from repostcheckerbot_spark.streaming.stream import (
        read_transcript_stream,
        sessionize_conversations,
    )

    src = tmp_path / "turns"
    src.mkdir()
    out = tmp_path / "sessions_out"
    ckpt = str(tmp_path / "ckpt_sess")
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    def run_pass():
        stream = read_transcript_stream(spark, str(src / "drop*"), watermark="0 seconds")
        sessions = sessionize_conversations(stream, gap_seconds=600)  # 10 min gap
        q = (
            sessions.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    # drop 1: conv A turn 1 OUT OF ORDER (turn_idx 1 arrives first), conv B turn 0
    import pandas as pd

    def write(name, rows):
        spark.createDataFrame(pd.DataFrame(rows), schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    t0 = TS
    write("drop1", [
        dict(conv_id="A", turn_idx=1, role="assistant", text="a-reply", tool="web", ts=t0),
        dict(conv_id="B", turn_idx=0, role="user", text="b-ask", tool="web", ts=t0),
    ])
    run_pass()

    # drop 2: A's turn 0 arrives late (still within gap); watermark t0
    write("drop2", [
        dict(conv_id="A", turn_idx=0, role="user", text="a-ask", tool="web", ts=t0 + timedelta(minutes=2)),
    ])
    run_pass()

    # drop 3: unrelated conv far in the future — watermark passes every
    # timeout → A and B both emit
    write("drop3", [
        dict(conv_id="Z", turn_idx=0, role="user", text="zzz", tool="web", ts=t0 + timedelta(hours=2)),
    ])
    run_pass()

    got = {r.conv_id: r for r in spark.read.parquet(str(out)).collect()}
    assert set(got) == {"A", "B"}
    # turn order imposed by turn_idx despite reversed arrival
    assert got["A"].doc_text == "a-ask\na-reply" and got["A"].n_turns == 2
    assert got["B"].doc_text == "b-ask" and got["B"].n_turns == 1
    assert got["A"].first_ts == t0 and got["A"].last_ts == t0 + timedelta(minutes=2)
