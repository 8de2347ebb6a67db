"""Incremental mode: identity skip, cross-batch matching, retention sweep,
tombstone purge, idempotent re-sweep (reference ST4/ST5)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.operators.ingest import IncrementalPipeline
from repostcheckerbot_spark.sinks.state import Warehouse

TS = datetime(2024, 1, 1)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def _conv(conv_id, text_parts, tool="web", ts=TS):
    return [
        (conv_id, i, "user" if i % 2 == 0 else "assistant", t, tool, ts + timedelta(seconds=i))
        for i, t in enumerate(text_parts)
    ]


@pytest.fixture()
def pipe(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    return IncrementalPipeline(wh, PipelineConfig())


BASE = ["hello there this is a long conversation about spark " * 3, "and here is the assistant reply with details " * 3]


def test_cross_batch_exact_match_and_identity_skip(spark, pipe):
    b1 = _turns(spark, _conv("c_orig", BASE))
    r1 = pipe.process_batch(b1)
    assert r1["new_edges"].count() == 0

    # batch 2: exact repost + a re-send of c_orig (must be identity-skipped)
    b2 = _turns(spark, _conv("c_repost", BASE, ts=TS + timedelta(days=1)) + _conv("c_orig", BASE))
    r2 = pipe.process_batch(b2)
    assert r2["batch_docs"].count() == 1  # c_orig skipped (J1)
    edges = r2["new_edges"].collect()
    assert len(edges) == 1
    e = edges[0]
    assert (e.conv_id_a, e.conv_id_b, e.score, e.method) == ("c_orig", "c_repost", 100.0, "exact")
    clusters = {r.conv_id: r.cluster_id for r in r2["clusters"].collect()}
    assert clusters == {"c_orig": "c_orig", "c_repost": "c_orig"}


def test_cross_batch_fuzzy_match(spark, pipe):
    pipe.process_batch(_turns(spark, _conv("c_a", BASE)))
    mutated = [BASE[0], "a completely different second turn with fresh content " * 3]
    r = pipe.process_batch(_turns(spark, _conv("c_b", mutated, ts=TS + timedelta(days=2))))
    edges = r["new_edges"].collect()
    assert len(edges) == 1
    assert edges[0].method == "fuzzy" and 50.0 < edges[0].score < 100.0


def test_reprocessing_same_batch_is_idempotent(spark, pipe):
    b = _turns(spark, _conv("c_x", BASE) + _conv("c_y", BASE, ts=TS + timedelta(hours=1)))
    r1 = pipe.process_batch(b)
    n_edges = r1["edges"].count()
    n_docs = pipe.corpus_docs().count()
    r2 = pipe.process_batch(b)  # re-sweep (ST5): nothing changes
    assert r2["batch_docs"].count() == 0
    assert r2["edges"].count() == n_edges
    assert pipe.corpus_docs().count() == n_docs


def test_tombstone_purge_and_edge_exclusion(spark, pipe):
    pipe.process_batch(_turns(spark, _conv("c_dead", BASE)))
    tomb = spark.createDataFrame([("c_dead",)], ["conv_id"])
    r = pipe.process_batch(
        _turns(spark, _conv("c_new", BASE, ts=TS + timedelta(days=1))), tombstones=tomb
    )
    assert r["new_edges"].count() == 0  # J5: match suppressed
    pipe.purge_deleted(tomb)
    assert pipe.corpus_docs().where(F.col("conv_id") == "c_dead").count() == 0


def test_retention_sweep(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    pipe = IncrementalPipeline(wh, PipelineConfig(retention_days=30))
    old = _conv("c_old", BASE, ts=TS)
    new = _conv("c_new", ["fresh content entirely unrelated " * 4], ts=TS + timedelta(days=100))
    now = F.to_timestamp(F.lit((TS + timedelta(days=100)).strftime("%Y-%m-%d %H:%M:%S")))
    # ingest gate drops c_old at arrival when it is already stale
    r = pipe.process_batch(_turns(spark, old + new), now=now)
    assert {x.conv_id for x in r["batch_docs"].collect()} == {"c_new"}
    # stored rows age out via the sweep
    pipe2 = IncrementalPipeline(Warehouse(spark, str(tmp_path / "wh3")), PipelineConfig(retention_days=30))
    pipe2.process_batch(_turns(spark, old), now=F.to_timestamp(F.lit("2024-01-02 00:00:00")))
    assert pipe2.corpus_docs().count() == 1
    n = pipe2.retention_sweep(now=now)
    assert n == 1 and pipe2.corpus_docs().count() == 0


def test_incremental_exact_probe_is_star_capped(spark, pipe):
    """A probe matching a viral duplicate group must emit O(probes) edges,
    not O(stored copies): 200 stored copies + 3 probes → exactly 3 new edges
    (probe → per-sha representative), and all 203 convs land in ONE cluster."""
    copies = []
    for i in range(200):
        copies += _conv(f"c{i:04d}", BASE, ts=TS + timedelta(minutes=i))
    r1 = pipe.process_batch(_turns(spark, copies))
    assert r1["new_edges"].count() == 199  # star within the batch, not 200·199/2

    probes = []
    for i in range(3):
        probes += _conv(f"p{i:02d}", BASE, ts=TS + timedelta(days=1, minutes=i))
    r2 = pipe.process_batch(_turns(spark, probes))
    exact = r2["new_edges"].where(F.col("method") == "exact")
    assert exact.count() == 3  # one edge per probe — NOT 3 × 200
    assert exact.where(F.col("conv_id_a") == "c0000").count() == 3  # rep = corpus min
    clusters = r2["clusters"].select("cluster_id").distinct().collect()
    assert len(clusters) == 1 and clusters[0].cluster_id == "c0000"


def test_delete_keys_dataframe_no_driver_collect(spark, tmp_path):
    """Bulk delete via a keys DATAFRAME (100k keys): no isin-literal plan, no
    driver materialization; bucketed path rewrites only key-bearing buckets."""
    wh = Warehouse(spark, str(tmp_path / "whdel"))
    rows = spark.range(100_000).select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("conv_id"),
        (F.col("id") % 100).alias("payload"),
    )
    wh.upsert("corpus", rows, key="conv_id", n_buckets=16)
    keys = spark.range(50_000).select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("conv_id")
    )
    n = wh.delete_keys("corpus", keys, "conv_id")
    assert n == 50_000
    remaining = wh.read("corpus")
    assert remaining.count() == 50_000
    assert remaining.where(F.col("conv_id") < "c0050000").count() == 0
    # deleting everything leaves a readable, empty, schema-stable table
    assert wh.delete_keys("corpus", wh.read("corpus").select("conv_id").localCheckpoint(), "conv_id") == 50_000
    assert wh.read("corpus").count() == 0 and wh.read("corpus").columns == ["conv_id", "payload"]


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "whbk"))
    base = spark.range(10_000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"), F.lit(1).cast("long").alias("v")
    )
    wh.upsert("t", base, key="conv_id", n_buckets=32)
    inc = spark.createDataFrame([("c5", 2), ("cNEW", 2)], ["conv_id", "v"])
    stats = wh.upsert("t", inc, key="conv_id")
    # merge I/O ∝ batch: at most 2 of 32 buckets rewritten
    assert stats["buckets_touched"] <= 2 and stats["buckets_total"] == 32
    assert stats["rows_written"] < 10_000 / 4
    out = wh.read("t")
    assert out.count() == 10_001
    assert {r.v for r in out.where(F.col("conv_id").isin("c5", "cNEW")).collect()} == {2}


def test_band_probe_io_proportional_to_batch(spark, pipe):
    """The fuzzy probe must touch colliding corpus bands only — a small batch
    against a big corpus of UNRELATED texts puts ~0 corpus bands through the
    cap/join (r2 ran the full corpus band set through a window per batch).
    Asserted via the ingest.probe_pool_bands metrics lineage row."""
    import random

    rng = random.Random(7)
    words = ["alpha", "bravo", "carol", "delta", "echoes", "fortan", "golfed", "hotelz"]

    def _text(i):
        return " ".join(rng.choice(words) + str(rng.randrange(10_000)) for _ in range(40))

    corpus_rows = []
    for i in range(120):
        corpus_rows += _conv(f"c{i:04d}", [_text(i), _text(i + 1000)])
    pipe.process_batch(_turns(spark, corpus_rows))

    batch_rows = _conv("probe01", [_text(5000), _text(6000)], ts=TS + timedelta(days=1))
    pipe.process_batch(_turns(spark, batch_rows))

    m = (
        pipe.wh.read("_metrics")
        .where(F.col("stage") == "ingest.probe_pool_bands")
        .orderBy(F.desc("recorded_at"))
        .limit(1)
        .collect()[0]
    )
    n_corpus_bands = pipe.wh.read("corpus_bands").count()
    batch_bands = pipe.cfg.bands  # 1 doc × bands
    # pool = batch bands + colliding corpus bands; unrelated texts ⇒ ~none
    assert m["rows_out"] <= batch_bands * 3, (m["rows_out"], n_corpus_bands)
    assert m["rows_out"] < n_corpus_bands / 10


def test_purge_heals_exact_star_when_rep_deleted(spark, pipe):
    """Exact edges are stars to the sha-group min; purging the rep must NOT
    disconnect the surviving copies (ADVICE r2): after deleting the oldest
    copy, the remaining two still share a cluster."""
    pipe.process_batch(_turns(spark, _conv("c_old", BASE)))
    pipe.process_batch(_turns(spark, _conv("d_mid", BASE, ts=TS + timedelta(days=1))))
    pipe.process_batch(_turns(spark, _conv("e_new", BASE, ts=TS + timedelta(days=2))))
    clusters = {r.conv_id: r.cluster_id for r in pipe.wh.read("clusters").collect()}
    assert clusters == {"c_old": "c_old", "d_mid": "c_old", "e_new": "c_old"}

    # purge the rep (the star center)
    dead = spark.createDataFrame([("c_old",)], "conv_id string")
    n = pipe.purge_deleted(dead)
    assert n == 1
    clusters = {r.conv_id: r.cluster_id for r in pipe.wh.read("clusters").collect()}
    assert clusters == {"d_mid": "d_mid", "e_new": "d_mid"}

    # and the healed star keeps working for future probes
    r = pipe.process_batch(_turns(spark, _conv("f_fut", BASE, ts=TS + timedelta(days=3))))
    clusters = {r.conv_id: r.cluster_id for r in r["clusters"].collect()}
    assert clusters == {"d_mid": "d_mid", "e_new": "d_mid", "f_fut": "d_mid"}


def test_corpus_reps_index_maintained(spark, pipe):
    """The corpus_reps index (sha → group rep, bucketed by sha) must stay an
    exact function of corpus_docs across batches AND purges — it is what the
    exact probe reads instead of re-aggregating the corpus every micro-batch."""
    pipe.process_batch(_turns(spark, _conv("c_one", BASE)))
    pipe.process_batch(_turns(spark, _conv("d_two", BASE, ts=TS + timedelta(days=1))))
    other = ["a totally different conversation body here " * 4, "yes entirely different " * 5]
    pipe.process_batch(_turns(spark, _conv("e_oth", other, ts=TS + timedelta(days=2))))

    reps = {r.doc_sha: r.rep for r in pipe.wh.read("corpus_reps").collect()}
    docs = pipe.wh.read("corpus_docs").collect()
    expect = {}
    for r in docs:
        expect[r.doc_sha] = min(expect.get(r.doc_sha, r.conv_id), r.conv_id)
    assert reps == expect and len(reps) == 2

    # purge the rep of the duplicate group: the index re-points at the new min
    pipe.purge_deleted(spark.createDataFrame([("c_one",)], "conv_id string"))
    reps = {r.doc_sha: r.rep for r in pipe.wh.read("corpus_reps").collect()}
    docs = pipe.wh.read("corpus_docs").collect()
    expect = {}
    for r in docs:
        expect[r.doc_sha] = min(expect.get(r.doc_sha, r.conv_id), r.conv_id)
    assert reps == expect
    assert reps[[r.doc_sha for r in docs if r.conv_id == "d_two"][0]] == "d_two"

    # probe I/O lineage: the rep probe reads a bounded bucket subset
    m = (
        pipe.wh.read("_metrics")
        .where(F.col("stage") == "ingest.rep_probe")
        .orderBy(F.desc("recorded_at"))
        .limit(1)
        .collect()
    )
    assert m, "rep_probe pruning metrics missing"
    import json as _json

    extra = _json.loads(m[0]["extra"])
    assert extra["buckets_read"] <= extra["buckets_total"]


def test_corpus_bands_purge_rewrites_only_dead_band_buckets(spark, tmp_path):
    """corpus_bands is bucketed by band_hash — unprunable by conv_id directly —
    so the purge recomputes the dead docs' band hashes and uses them as the
    delete's prune hint. With n_buckets ≫ bands·|dead| (the 100-TB shape),
    only the buckets actually holding a doomed row may be rewritten; every
    other bucket directory must keep its exact file list (pre-r3 this delete
    was a full-table rewrite)."""
    import os

    cfg = PipelineConfig(bands=8, rows_per_band=2, warehouse_buckets=64)
    pipe = IncrementalPipeline(Warehouse(spark, str(tmp_path / "wh_bprune")), cfg)
    rows = []
    for i in range(40):
        body = [f"conversation number {i} about topic {i * 37} " * 4, f"reply body {i * 91} " * 5]
        rows += _conv(f"c{i:04d}", body)
    pipe.process_batch(_turns(spark, rows))

    bands_path = pipe.wh._path("corpus_bands")

    def listing():
        return {
            d: sorted(os.listdir(os.path.join(bands_path, d)))
            for d in os.listdir(bands_path)
            if d.startswith("_bucket=")
        }

    before = listing()
    assert len(before) > 16  # corpus bands spread over many buckets
    n_rows_before = pipe.wh.read("corpus_bands").count()

    dead = ["c0003", "c0007"]
    pipe.purge_deleted(spark.createDataFrame([(c,) for c in dead], "conv_id string"))

    after = listing()
    # the doomed rows are fully gone, survivors intact
    bands_now = pipe.wh.read("corpus_bands")
    assert bands_now.where(F.col("conv_id").isin(dead)).count() == 0
    assert bands_now.count() == n_rows_before - 2 * cfg.bands
    # pruning: ≤ bands·|dead| buckets rewritten; the rest byte-identical
    changed = [d for d in before if after.get(d) != before[d]]
    assert 0 < len(changed) <= 2 * cfg.bands
    untouched = [d for d in before if after.get(d) == before[d]]
    assert len(untouched) >= len(before) - 2 * cfg.bands
    # and the purged warehouse still ingests + matches correctly
    r = pipe.process_batch(
        _turns(spark, _conv("c0003", [f"conversation number 4 about topic {4 * 37} " * 4,
                                      f"reply body {4 * 91} " * 5], ts=TS + timedelta(days=1)))
    )
    assert r["batch_docs"].count() == 1  # re-ingest after purge is allowed


def test_incremental_cluster_update_matches_full_recompute(spark, tmp_path):
    """The affected-component incremental cluster update (taken when the
    corpus exceeds cfg.incremental_clusters_min_corpus) must produce the
    IDENTICAL clusters table as the full-recompute path, batch for batch —
    including cross-batch merges of previously separate components."""
    full = IncrementalPipeline(
        Warehouse(spark, str(tmp_path / "wh_full")), PipelineConfig()
    )
    incr = IncrementalPipeline(
        Warehouse(spark, str(tmp_path / "wh_incr")),
        PipelineConfig(incremental_clusters_min_corpus=0),
    )
    other = ["entirely different content in this conversation " * 4, "another reply " * 6]
    batches = [
        _turns(spark, _conv("c_a", BASE) + _conv("x_1", other)),
        _turns(spark, _conv("d_b", BASE, ts=TS + timedelta(days=1))),
        # merges BASE group (c_a,d_b) with a new copy AND starts a new group
        _turns(
            spark,
            _conv("e_c", BASE, ts=TS + timedelta(days=2))
            + _conv("y_2", other, ts=TS + timedelta(days=2)),
        ),
    ]
    for b in batches:
        full.process_batch(b)
        incr.process_batch(b)
        got_f = {r.conv_id: r.cluster_id for r in full.wh.read("clusters").collect()}
        got_i = {r.conv_id: r.cluster_id for r in incr.wh.read("clusters").collect()}
        assert got_f == got_i
    assert got_i == {
        "c_a": "c_a", "d_b": "c_a", "e_c": "c_a", "x_1": "x_1", "y_2": "x_1",
    }
