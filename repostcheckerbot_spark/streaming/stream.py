"""Structured Streaming rendering of the reference's poll loops (ST1-ST5).

The reference hand-rolls streaming: infinite listing sweeps
(/root/reference/app.py:64-125,133-220), ``@setInterval`` janitors
(app.py:23; database.py:255; setInterval.py:3-17), and the SQLite file as
accumulating state. The Spark-native rendering:

- source:   ``spark.readStream`` on the transcripts table (Iceberg streaming
  read on a cluster; file-stream parquet source in the sandbox);
- watermark: ``withWatermark("ts", …)`` ≙ the retention/late-data gate
  (database.py:312-323) — late rows beyond the watermark are dropped by the
  engine instead of an if-check per record;
- per-batch logic: ``foreachBatch`` → ``IncrementalPipeline.process_batch``.
  Blocking/scoring/clustering stay the exact batch operators; streaming adds
  only arrival semantics. Exactly-once: checkpointLocation + the pipeline's
  idempotent identity anti-join (ST5) make replays harmless;
- trigger:  ``availableNow`` for catch-up sweeps (≙ the reference's
  1000-then-10 listing sweep, app.py:137,210), ``processingTime`` for the
  steady state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.operators.ingest import IncrementalPipeline
from repostcheckerbot_spark.sinks.state import Warehouse

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcript_stream(spark: SparkSession, path: str, watermark: str = "1 day") -> DataFrame:
    """File-based streaming source over a directory of transcript parquet
    drops (Iceberg incremental read on a real cluster)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
        .withWatermark("ts", watermark)
    )


def start_pipeline_stream(
    stream: DataFrame,
    warehouse: Warehouse,
    cfg: PipelineConfig,
    checkpoint_location: str,
    available_now: bool = True,
):
    """Wire the incremental pipeline as a foreachBatch sink and start it."""
    pipe = IncrementalPipeline(warehouse, cfg)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipe.process_batch(batch_df)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()


# --------------------------------------------------------------------------
# ST4+: custom stateful operator — conversation sessionization
# --------------------------------------------------------------------------
SESSION_OUT_SCHEMA = (
    "conv_id string, n_turns int, doc_text string, first_ts timestamp, last_ts timestamp"
)
SESSION_STATE_SCHEMA = (
    "turn_idxs array<int>, roles array<string>, texts array<string>, "
    "tool string, first_ts long, last_ts long"
)


def sessionize_conversations(stream: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Arbitrary-stateful sessionization via ``applyInPandasWithState``: turns
    accumulate per ``conv_id`` in the state store; a conversation is emitted
    as ONE assembled document only once it has been QUIET for ``gap_seconds``
    of event time (watermark passes last_ts + gap).

    This is the semantics ``foreachBatch`` cannot express — emission on
    QUIESCENCE, not on batch boundaries: the reference processes a post only
    after its listing sweep completes (app.py:133-220); here a conversation
    "completes" when no further turns arrive within the gap. Turns arriving
    across many micro-batches land in the same session; turn order is imposed
    by ``turn_idx`` sort at emission (the per-turn ordering invariant), never
    by arrival order. State is (arrays of turn fields + scalars) — columnar,
    Arrow-transferred, no Python objects in the store.

    The input stream MUST carry a watermark on ``ts`` (event-time timeout).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from repostcheckerbot_spark.operators.assembly import TURN_SEP

    sep = TURN_SEP  # captured by value into the serialized closure

    def _fn(key, pdfs, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            idxs, roles, texts, tool, first_ts, last_ts = state.get
            order = sorted(range(len(idxs)), key=lambda i: (idxs[i], texts[i] or ""))
            doc_text = sep.join(texts[i] for i in order if texts[i] is not None)
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_turns": len(idxs),
                        "doc_text": doc_text,
                        "first_ts": pd.Timestamp(first_ts, unit="ms"),
                        "last_ts": pd.Timestamp(last_ts, unit="ms"),
                    }
                ]
            )
            return
        idxs, roles, texts = [], [], []
        tool, first_ts, last_ts = None, None, None
        if state.exists:
            idxs, roles, texts, tool, first_ts, last_ts = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                state.get[3],
                state.get[4],
                state.get[5],
            )
        for pdf in pdfs:
            if not len(pdf):
                continue
            idxs.extend(int(x) for x in pdf["turn_idx"].tolist())
            roles.extend(pdf["role"].tolist())
            texts.extend(pdf["text"].tolist())
            if tool is None:
                tool = pdf["tool"].iloc[0]
            ts_ms = (pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((idxs, roles, texts, tool, first_ts, last_ts))
        state.setTimeoutTimestamp(last_ts + gap_seconds * 1000)
        return
        yield  # generator function; nothing emitted on update

    return stream.groupBy("conv_id").applyInPandasWithState(
        _fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
