"""Incremental mode: new batch vs accumulated corpus (reference ST4/ST5).

The reference is an infinite poll loop: each arriving record is (1) skipped if
its identity key is already stored (/root/reference/database.py:328-334), (2)
age-gated (database.py:312-323), (3) probed exactly then fuzzily against ALL
accumulated state (database.py:288-711), (4) appended (database.py:714-775).
Matches whose original was deleted upstream are dropped and purged
(database.py:649-676).

Spark rendering: one micro-batch job over a corpus of assembled docs.

  new turns → assemble → age gate
    → LEFT ANTI join corpus on conv_id          (J1  identity skip)
    → exact:  equi-join corpus on doc_sha       (J2  — corpus side bucketed
              by sha; probe side usually small → broadcast)
    → fuzzy:  LSH bands of the batch JOIN persisted bands of the corpus
              (probe bands ⋈ corpus bands on (block, band_id, band_hash)) —
              the batch never rescans corpus text, only colliding buckets
    → anti-join tombstones                       (J5)
    → upsert docs+bands into corpus state        (ST5 idempotent MERGE)
    → re-run CC on (old edges ∪ new edges)

State tables (Warehouse): ``corpus_docs`` (conv_id, doc_sha, norm_text, tool,
first_ts, …), ``corpus_bands`` (block cols, band_id, band_hash, conv_id),
``edges``, ``clusters``, ``_metrics``. At cluster scale these are Iceberg
tables partitioned by bucket(conv_id) / (band_id) respectively; here parquet
behind the same interface.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repostcheckerbot_spark.config import PipelineConfig
from repostcheckerbot_spark.operators.assembly import assemble_docs
from repostcheckerbot_spark.operators.blocking import with_bands, with_signature
from repostcheckerbot_spark.operators.clustering import connected_components
from repostcheckerbot_spark.operators.retention import apply_ingest_gate, within_retention
from repostcheckerbot_spark.operators.scoring import difflib_ratio
from repostcheckerbot_spark.sinks.state import MetricsSink, Warehouse

DOC_COLS = ["conv_id", "doc_sha", "norm_text", "role_sig", "tool", "first_ts", "n_turns"]


class IncrementalPipeline:
    def __init__(self, warehouse: Warehouse, cfg: PipelineConfig):
        self.wh = warehouse
        self.cfg = cfg

    # -- state accessors ----------------------------------------------------
    def corpus_docs(self) -> DataFrame | None:
        return self.wh.read("corpus_docs") if self.wh.exists("corpus_docs") else None

    def corpus_bands(self) -> DataFrame | None:
        return self.wh.read("corpus_bands") if self.wh.exists("corpus_bands") else None

    def edges(self) -> DataFrame | None:
        return self.wh.read("edges") if self.wh.exists("edges") else None

    # -- one micro-batch ------------------------------------------------------
    def process_batch(
        self,
        new_transcripts: DataFrame,
        tombstones: DataFrame | None = None,
        now=None,
    ) -> dict[str, DataFrame]:
        cfg = self.cfg
        metrics = MetricsSink(self.wh)
        t0 = time.monotonic()

        batch_docs = assemble_docs(apply_ingest_gate(new_transcripts, cfg.retention_days, now=now))

        corpus = self.corpus_docs()
        if corpus is not None:
            # J1: identity skip — already-logged conv_ids never re-enter
            batch_docs = batch_docs.join(corpus.select("conv_id"), "conv_id", "left_anti")
        batch_docs = batch_docs.localCheckpoint(eager=True)
        metrics.record_count("ingest.batch_docs", batch_docs.count())

        sig = with_signature(batch_docs, cfg).select(*cfg.block_cols, "conv_id", "minhash")
        banded = with_bands(sig, cfg)
        key = [*cfg.block_cols, "band_id", "band_hash"]
        batch_bands = banded.select(*key, "conv_id").localCheckpoint(eager=True)

        # ---- exact edges: batch sha ⋈ (corpus ∪ batch) sha ------------------
        probe = batch_docs.select("conv_id", "doc_sha")
        store = probe if corpus is None else corpus.select("conv_id", "doc_sha").unionByName(probe)
        exact = (
            probe.withColumnRenamed("conv_id", "conv_id_new")
            .join(store.withColumnRenamed("conv_id", "conv_id_old"), "doc_sha")
            .where(F.col("conv_id_old") != F.col("conv_id_new"))
            .select(
                F.least("conv_id_old", "conv_id_new").alias("conv_id_a"),
                F.greatest("conv_id_old", "conv_id_new").alias("conv_id_b"),
                F.lit(100.0).alias("score"),
                F.lit("exact").alias("method"),
            )
            .dropDuplicates(["conv_id_a", "conv_id_b"])
        )

        # ---- fuzzy candidates: batch bands ⋈ (corpus ∪ batch) bands ---------
        all_bands = batch_bands if self.corpus_bands() is None else self.corpus_bands().unionByName(batch_bands)
        cand = (
            batch_bands.withColumnRenamed("conv_id", "conv_id_new")
            .join(all_bands.withColumnRenamed("conv_id", "conv_id_old"), key)
            .where(F.col("conv_id_old") != F.col("conv_id_new"))
            .select(
                F.least("conv_id_old", "conv_id_new").alias("conv_id_a"),
                F.greatest("conv_id_old", "conv_id_new").alias("conv_id_b"),
            )
            .dropDuplicates(["conv_id_a", "conv_id_b"])
            .join(exact.select("conv_id_a", "conv_id_b"), ["conv_id_a", "conv_id_b"], "left_anti")
        )
        texts = batch_docs.select("conv_id", "norm_text")
        if corpus is not None:
            texts = corpus.select("conv_id", "norm_text").unionByName(texts)
        paired = (
            cand.join(texts.withColumnRenamed("conv_id", "conv_id_a").withColumnRenamed("norm_text", "ta"), "conv_id_a")
            .join(texts.withColumnRenamed("conv_id", "conv_id_b").withColumnRenamed("norm_text", "tb"), "conv_id_b")
        )
        # spread the CPU-bound scoring stage (see scoring.fuzzy_edges)
        paired = paired.repartition(paired.sparkSession.sparkContext.defaultParallelism)
        fuzzy = (
            paired.withColumn("ratio", difflib_ratio(F.col("ta"), F.col("tb")))
            .where(F.col("ratio") > F.lit(cfg.ratio_threshold))
            .select(
                "conv_id_a",
                "conv_id_b",
                (F.col("ratio") * 100.0).alias("score"),
                F.lit("fuzzy").alias("method"),
            )
        )
        new_edges = exact.unionByName(fuzzy)

        # ---- J5: drop edges touching upstream-deleted conversations ---------
        if tombstones is not None:
            dead = tombstones.select("conv_id")
            new_edges = new_edges.join(
                dead.withColumnRenamed("conv_id", "conv_id_a"), "conv_id_a", "left_anti"
            ).join(dead.withColumnRenamed("conv_id", "conv_id_b"), "conv_id_b", "left_anti")
        new_edges = new_edges.localCheckpoint(eager=True)
        metrics.record_count("ingest.new_edges", new_edges.count())

        # ---- persist state (idempotent upserts, ST5) -------------------------
        self.wh.upsert("corpus_docs", batch_docs.select(*DOC_COLS), key="conv_id")
        if self.wh.exists("corpus_bands"):
            self.wh.append("corpus_bands", batch_bands)
        else:
            self.wh.overwrite("corpus_bands", batch_bands)

        old_edges = self.edges()
        all_edges = new_edges if old_edges is None else old_edges.unionByName(new_edges).dropDuplicates(
            ["conv_id_a", "conv_id_b"]
        )
        self.wh.overwrite("edges", all_edges)
        all_edges = self.wh.read("edges")

        # ---- implicit-cluster growth: CC over old ∪ new edges ---------------
        clusters = connected_components(
            all_edges,
            vertices=self.wh.read("corpus_docs").select("conv_id"),
            max_iterations=cfg.cc_max_iterations,
        )
        self.wh.overwrite("clusters", clusters)
        metrics.record_count("ingest.batch", 0, wall_s=time.monotonic() - t0)
        metrics.flush()
        return {
            "batch_docs": batch_docs,
            "new_edges": new_edges,
            "edges": all_edges,
            "clusters": self.wh.read("clusters"),
        }

    # -- janitors (reference §3.4) -------------------------------------------
    def retention_sweep(self, now=None) -> int:
        """Daily TTL sweep (database.py:255-285): purge docs past retention,
        plus their bands and edges."""
        if self.cfg.retention_days is None or not self.wh.exists("corpus_docs"):
            return 0
        now_col = now if now is not None else F.current_timestamp()
        docs = self.wh.read("corpus_docs")
        expired = docs.where(~within_retention(F.col("first_ts"), self.cfg.retention_days, now_col))
        dead = [r.conv_id for r in expired.select("conv_id").collect()]
        if not dead:
            return 0
        n = self.wh.delete_where("corpus_docs", F.col("conv_id").isin(dead))
        if self.wh.exists("corpus_bands"):
            self.wh.delete_where("corpus_bands", F.col("conv_id").isin(dead))
        if self.wh.exists("edges"):
            self.wh.delete_where("edges", F.col("conv_id_a").isin(dead) | F.col("conv_id_b").isin(dead))
        return n

    def purge_deleted(self, tombstones: DataFrame) -> None:
        """Dead-link purge (database.py:88-94,653-676): remove tombstoned
        conversations from all state."""
        dead = [r.conv_id for r in tombstones.select("conv_id").collect()]
        if not dead:
            return
        for table, cond in [
            ("corpus_docs", F.col("conv_id").isin(dead)),
            ("corpus_bands", F.col("conv_id").isin(dead)),
            ("edges", F.col("conv_id_a").isin(dead) | F.col("conv_id_b").isin(dead)),
        ]:
            if self.wh.exists(table):
                self.wh.delete_where(table, cond)
