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
