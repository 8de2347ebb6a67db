"""Multimodal payload plumbing: opaque binary columns + typed metadata.

The reference fetches and perceptually hashes images/GIFs/videos
(/root/reference/database.py:70-212: urlopen → PIL → dhash; av → frame loop).
In a Spark training-data pipeline the payload is an opaque ``binary`` column
with typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` over partition-sized batches.

The image/audio decode libraries are NOT in this container, so the decode
kernel is a clearly-marked stub (deterministic fake + NotImplementedError for
the real path). The Spark-side plumbing — schema, batch iteration, signature
array handling, the per-frame min-Hamming-mean video score (database.py:
215-227) — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | gif | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

SIGNATURE_SCHEMA = "media_id long, kind string, frame_idx int, dhash long"


def fake_dhash(payload: bytes, frame_idx: int) -> int:
    """DETERMINISTIC STUB for the perceptual difference hash
    (reference: dhash.dhash_int, database.py:86,139,182-183).

    Real implementation needs PIL/pyav (absent here); raise for real media,
    fake deterministically for test payloads (prefix b"FAKE").
    """
    if payload is None:
        return 0
    if not payload.startswith(b"FAKE"):
        raise NotImplementedError("image/video decode requires PIL/pyav — not available in this container")
    import hashlib

    h = hashlib.sha256(payload + frame_idx.to_bytes(4, "big")).digest()
    return int.from_bytes(h[:8], "big", signed=True)


def extract_frame_signatures(media: DataFrame, frame_sample_rate: int = 1) -> DataFrame:
    """mapInPandas kernel: media rows → one row per sampled frame with its
    dhash. Batch shape: Arrow record batches in, long-form frames out."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                n = int(row["n_frames"]) if row["kind"] != "image" else 1
                for f in range(0, n, frame_sample_rate):
                    out.append(
                        dict(
                            media_id=row["media_id"],
                            kind=row["kind"],
                            frame_idx=f,
                            dhash=fake_dhash(row["payload"], f),
                        )
                    )
            yield pd.DataFrame(out, columns=["media_id", "kind", "frame_idx", "dhash"])

    return media.mapInPandas(kernel, schema=SIGNATURE_SCHEMA)


def video_pair_score(sig: DataFrame, pairs: DataFrame, thresh: int = 5) -> DataFrame:
    """The reference's video similarity (database.py:215-227), relational:

    for each original frame: min Hamming distance to ANY new frame (A2);
    score = mean of those minima (A3) — asymmetric by construction (original
    on the left, matching the reference's loop order). Accept: mean < thresh;
    score = ((thresh - mean)/thresh)*100 (F6/F7, database.py:451-454).

    pairs(media_id_a, media_id_b) → (media_id_a, media_id_b, mean_min_hamming,
    score) for accepted pairs.
    """
    a = sig.select(F.col("media_id").alias("media_id_a"), F.col("frame_idx").alias("fa"), F.col("dhash").alias("ha"))
    b = sig.select(F.col("media_id").alias("media_id_b"), F.col("frame_idx").alias("fb"), F.col("dhash").alias("hb"))
    frame_pairs = pairs.join(a, "media_id_a").join(b, "media_id_b")
    min_per_frame = frame_pairs.groupBy("media_id_a", "media_id_b", "fa").agg(
        F.min(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))).alias("min_d")
    )
    return (
        min_per_frame.groupBy("media_id_a", "media_id_b")
        .agg(F.avg("min_d").alias("mean_min_hamming"))
        .where(F.col("mean_min_hamming") < thresh)
        .withColumn("score", F.round((thresh - F.col("mean_min_hamming")) / thresh * 100.0, 6))
    )
