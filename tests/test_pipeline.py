"""End-to-end: pairwise F1 vs the reference-semantics oracle, cluster parity,
tombstones, retention. This is the acceptance test (BASELINE.json)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.fixtures import generate, to_spark
from repostcheckerbot_spark.pipeline import repost_report, run_batch

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def result(spark):
    fixture = generate(n_conv=120, seed=42)
    transcripts, labeled, clusters, tombstones = to_spark(spark, fixture)
    res = run_batch(transcripts, CFG)
    return fixture, transcripts, labeled, clusters, tombstones, res


def test_pairwise_f1_at_least_099(spark, result):
    _, _, labeled, _, _, res = result
    # pipeline pairwise verdict for a labeled pair = exact (same doc_sha;
    # exact edges are stars, group membership IS the pairwise verdict) or a
    # scored fuzzy/exact edge
    shas = res.docs.select("conv_id", "doc_sha")
    edge = res.edges.select("conv_id_a", "conv_id_b").withColumn("has_edge", F.lit(True))
    joined = (
        labeled.join(
            shas.withColumnRenamed("conv_id", "conv_id_a").withColumnRenamed("doc_sha", "sha_a"), "conv_id_a"
        )
        .join(shas.withColumnRenamed("conv_id", "conv_id_b").withColumnRenamed("doc_sha", "sha_b"), "conv_id_b")
        .join(edge, ["conv_id_a", "conv_id_b"], "left")
        .withColumn("pred", (F.col("sha_a") == F.col("sha_b")) | F.coalesce(F.col("has_edge"), F.lit(False)))
    )
    agg = joined.agg(
        F.sum(F.when(F.col("is_dup") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_dup") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_dup") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg.tp, agg.fp, agg.fn
    assert tp > 20, "fixture produced too few positive pairs"
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} (tp={tp} fp={fp} fn={fn})"


def test_clusters_match_golden_union_find(spark, result):
    _, _, _, golden, _, res = result
    # golden is union-find over labeled is_dup pairs; pipeline must agree on
    # every conv_id (representative = min conv_id by construction on both sides)
    got = res.clusters
    diff = golden.join(got, ["conv_id", "cluster_id"], "left_anti")
    mismatched = diff.count()
    assert mismatched == 0, f"{mismatched} conv_ids clustered differently: {diff.limit(5).collect()}"
    assert got.count() == golden.count()


def test_exact_dup_always_scores_100(spark, result):
    _, _, labeled, _, _, res = result
    exact_pairs = labeled.where(F.col("ratio") == 1.0)
    if exact_pairs.count() == 0:
        pytest.skip("no exact pairs in fixture")
    # every labeled exact pair shares a doc_sha (the group-membership verdict) …
    shas = res.docs.select("conv_id", "doc_sha")
    j = (
        exact_pairs.join(
            shas.withColumnRenamed("conv_id", "conv_id_a").withColumnRenamed("doc_sha", "sha_a"), "conv_id_a"
        ).join(shas.withColumnRenamed("conv_id", "conv_id_b").withColumnRenamed("doc_sha", "sha_b"), "conv_id_b")
    )
    assert j.where(F.col("sha_a") != F.col("sha_b")).count() == 0
    # … and every exact star edge carries score 100 (database.py:382)
    assert res.edges.where((F.col("method") == "exact") & (F.col("score") != 100.0)).count() == 0


def test_tombstoned_edges_excluded(spark, result):
    fixture, transcripts, _, _, tombstones, _ = result
    if tombstones is None:
        pytest.skip("no tombstones in fixture")
    res = run_batch(transcripts, CFG, tombstones=tombstones)
    dead = {r.conv_id for r in tombstones.collect()}
    touching = res.edges.where(
        F.col("conv_id_a").isin(*dead) | F.col("conv_id_b").isin(*dead)
    ).count()
    assert touching == 0


def test_retention_gate_drops_aged_rows(spark):
    fixture = generate(n_conv=80, seed=13, retention_days=365)
    transcripts, *_ = to_spark(spark, fixture)
    cfg = PipelineConfig(retention_days=365)
    # pin "now" so the test is deterministic
    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    res = run_batch(transcripts, cfg, now=now)
    kept = {r.conv_id for r in res.docs.select("conv_id").collect()}
    assert fixture.aged_conv_ids, "fixture should contain aged rows"
    assert not (set(fixture.aged_conv_ids) & kept)


def test_report_shape(spark, result):
    _, _, _, _, _, res = result
    rep = repost_report(res.edges, res.docs, now=F.to_timestamp(F.lit("2025-01-01 00:00:00")))
    assert rep.columns == ["probe_conv_id", "rank", "matched_conv_id", "time_ago", "percent_matched", "method"]
    r = rep.limit(5).collect()
    assert all(x.time_ago.endswith(" ago") for x in r)
