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
