"""Blocking: shingle determinism, MinHash stability, LSH candidate recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.fixtures import generate, to_spark
from repostcheckerbot_spark.operators.assembly import assemble_docs
from repostcheckerbot_spark.operators.blocking import generate_candidates, with_minhash, with_shingles

CFG = PipelineConfig()


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(f"c{i}", t, "tool_x", 0) for i, t in enumerate(texts)],
        ["conv_id", "norm_text", "tool", "role_sig"],
    )


def test_shingles_deterministic(spark):
    df = with_shingles(_docs(spark, ["abcdefghij", "abcdefghij", "short"]), CFG)
    rows = {r.conv_id: r.shingle_hashes for r in df.collect()}
    assert rows["c0"] == rows["c1"]
    assert len(rows["c0"]) == 10 - CFG.shingle_k + 1
    assert len(rows["c2"]) == 1  # doc shorter than k → whole text
    # xxhash64 of the same shingle appearing at two positions is equal
    df2 = with_shingles(_docs(spark, ["abcabcabc"]), PipelineConfig(shingle_k=3))
    h = df2.collect()[0].shingle_hashes
    assert h[0] == h[3] == h[6]


def test_minhash_identical_docs_identical_signature(spark):
    df = with_minhash(with_shingles(_docs(spark, ["hello world " * 10, "hello world " * 10]), CFG), CFG)
    sigs = [r.minhash for r in df.collect()]
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == CFG.num_hashes


def test_candidate_recall_on_fixture_dups(spark):
    """Every labeled dup pair (ratio > 0.5) at a shared block must surface as
    an LSH candidate or an exact sha pair — the recall half of F1≥0.99."""
    fixture = generate(n_conv=60, seed=11)
    transcripts, labeled, *_ = to_spark(spark, fixture)
    docs = assemble_docs(transcripts)
    cands, _ = generate_candidates(docs, CFG)
    dups = labeled.where(F.col("is_dup"))
    # exact pairs (ratio == 1.0) are covered by the sha path, not LSH
    lsh_needed = dups.where(F.col("ratio") < 1.0)
    missed = lsh_needed.join(cands, ["conv_id_a", "conv_id_b"], "left_anti")
    n_needed = lsh_needed.count()
    n_missed = missed.count()
    assert n_needed > 5
    assert n_missed == 0, f"LSH missed {n_missed}/{n_needed} dup pairs"


def test_candidates_only_within_block(spark):
    """Cross-block pairs are never generated (reference: one DB per
    subreddit, database.py:26-35)."""
    texts = ["the same exact text here " * 5] * 2
    df = spark.createDataFrame(
        [("a", texts[0], "tool_1", 0), ("b", texts[1], "tool_2", 0)],
        ["conv_id", "norm_text", "tool", "role_sig"],
    )
    cands, _ = generate_candidates(df, CFG)
    assert cands.count() == 0


def test_band_bucket_cap_records_metrics_not_silent(spark):
    cfg = PipelineConfig(max_band_bucket=4)
    texts = ["identical content repeated for skew " * 5] * 20
    df = _docs(spark, texts)
    cands, bucket_metrics = generate_candidates(df, cfg)
    # capped: pairs bounded by C(4,2) per bucket, and the cap is visible
    assert bucket_metrics.count() > 0
    assert bucket_metrics.agg(F.max("bucket_size")).collect()[0][0] == 20
    assert cands.count() <= 4 * 3 / 2
