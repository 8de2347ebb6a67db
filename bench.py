"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the actual entity-resolution workload (flagship pipeline over
derived transcripts: assembly → MinHash-LSH → difflib scoring → CC) plus the
heavier standalone operators (LSH candidates, simhash, exact dedup, ANN,
TPC-H-style agg).

Protocol: a small warmup pass (sf0.001 flagship — JIT + Python-worker spinup),
then the WHOLE query list is run $SPARK_GRAFT_BENCH_RUNS times (default 3)
INTERLEAVED, and each query reports its best-of-N. Single runs on this host
drift ±20% (BENCH/BASELINE.md) — the r2 regression call was only possible
because two independent runs agreed. Per-run arrays, spreads, and result
counts land in BENCH/RUNS_latest.json (the driver-facing stdout line stays
small — totals + best-of only). Run `python scripts/scaling_bench.py` for
the pinned scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as ent
    from repostcheckerbot_spark.config import PipelineConfig
    from repostcheckerbot_spark.operators.assembly import assemble_docs
    from repostcheckerbot_spark.operators.blocking import generate_candidates
    from repostcheckerbot_spark.pipeline import run_batch
    from repostcheckerbot_spark.session import get_spark
    from repostcheckerbot_spark.sources.testdata import transcripts_from_documents

    spark = get_spark(app_name="rcb_bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    q = ent.queries()

    import shutil
    import tempfile

    from repostcheckerbot_spark.operators.ingest import IncrementalPipeline
    from repostcheckerbot_spark.sinks.state import Warehouse

    # flagship: the full ER pipeline (count forces full materialization)
    def flagship():
        tr = transcripts_from_documents(spark, SF_DIR)
        res = run_batch(tr, PipelineConfig())
        return res.clusters.where(F.col("conv_id") != F.col("cluster_id")).count()

    # incremental micro-batch latency: 10% of the conversations arriving
    # against a warehouse holding the other 90% — the number that proves the
    # bucket-pruned probes (corpus_reps index, band semi-join, text lookup)
    # in WALL-CLOCK terms, not just metrics rows. The 90% corpus is built
    # ONCE (untimed); each timed run clones that warehouse so state is
    # identical across the best-of-N runs.
    _incr_template = tempfile.mkdtemp(prefix="rcb_bench_incr_tpl_")

    def _build_incr_template():
        tr = transcripts_from_documents(spark, SF_DIR)
        big = tr.where(F.abs(F.xxhash64("conv_id")) % 10 != 0)
        pipe = IncrementalPipeline(Warehouse(spark, _incr_template), PipelineConfig())
        pipe.process_batch(big)

    def incremental_microbatch():
        tr = transcripts_from_documents(spark, SF_DIR)
        small = tr.where(F.abs(F.xxhash64("conv_id")) % 10 == 0)
        wh_dir = tempfile.mkdtemp(prefix="rcb_bench_incr_run_")
        shutil.rmtree(wh_dir)
        shutil.copytree(_incr_template, wh_dir)
        pipe = IncrementalPipeline(Warehouse(spark, wh_dir), PipelineConfig())
        out = pipe.process_batch(small)
        n = out["clusters"].where(F.col("conv_id") != F.col("cluster_id")).count()
        shutil.rmtree(wh_dir, ignore_errors=True)
        return n

    def lsh_candidates():
        docs = assemble_docs(transcripts_from_documents(spark, SF_DIR))
        cands, _ = generate_candidates(docs, PipelineConfig())
        return cands.count()

    def tfidf_canopy():
        from repostcheckerbot_spark.operators.er import tfidf_cosine_pairs
        from repostcheckerbot_spark.sources.testdata import load

        d = load(spark, SF_DIR, "documents")
        return tfidf_cosine_pairs(d, n=2, min_cosine=0.6, max_df_frac=0.02).count()

    suite: list[tuple[str, object]] = [
        ("flagship_pipeline", flagship),
        ("incremental_microbatch", incremental_microbatch),
        ("lsh_candidates_xxhash", lsh_candidates),
        ("exact_dedup", lambda: q["dedup_keep_first"](spark, SF_DIR).count()),
        ("simhash", lambda: q["simhash"](spark, SF_DIR).count()),
        ("simhash_near_pairs", lambda: q["simhash_near_pairs"](spark, SF_DIR).count()),
        ("minhash_lsh_md5", lambda: q["lsh_candidates"](spark, SF_DIR).count()),
        ("cosine_topk_bruteforce", lambda: q["cosine_topk_bruteforce"](spark, SF_DIR).count()),
        ("cosine_topk_lsh", lambda: q["cosine_topk_lsh"](spark, SF_DIR).count()),
        ("cosine_topk_ivf", lambda: q["cosine_topk_ivf"](spark, SF_DIR).count()),
        ("q1_pricing_summary", lambda: q["q1_pricing_summary"](spark, SF_DIR).count()),
        ("token_stats", lambda: q["token_stats"](spark, SF_DIR).count()),
        ("events_ts_buckets", lambda: q["events_ts_buckets"](spark, SF_DIR).count()),
        # round-3 additions: multi-field ER linkage (18M scored pairs at
        # sf0.1), the curation passes, and the rare-gram TF-IDF canopy at its
        # scale-realistic DF cap (the oracled query uses the looser demo cap)
        ("fs_linkage", lambda: q["fs_linkage"](spark, SF_DIR).count()),
        ("tfidf_canopy", lambda: tfidf_canopy()),
        # round-4 addition: the single-linkage dendrogram ladder (3 closures
        # via contraction over the simhash near-dup graph)
        ("threshold_ladder", lambda: q["threshold_cluster_ladder"](spark, SF_DIR).count()),
        # late round-4 addition: the privacy-preserving linkage path
        # (CLK Bloom encode -> chunk-blocked Dice) over 2x the customer table
        ("pprl_clk_linkage", lambda: q["pprl_clk_linkage"](spark, SF_DIR).count()),
        # round-5 addition: the production-width (120-bit, 8-chunk) PPRL path
        ("pprl_clk_linkage_wide", lambda: q["pprl_clk_linkage_wide"](spark, SF_DIR).count()),
        ("decontamination", lambda: q["decontamination"](spark, SF_DIR).count()),
        ("bm25_scores", lambda: q["bm25_scores"](spark, SF_DIR).count()),
        ("pack_manifest", lambda: q["pack_manifest"](spark, SF_DIR).count()),
    ]

    # warmup: JIT the codegen/shuffle paths + spin up the Python UDF workers
    # on the tiny SF so run 1 doesn't pay ~9 s of one-time JVM cost. The
    # incremental path gets its own tiny warmup batch (same plan shapes:
    # bucket-pruned probes, parallel bucketed merges, CC limit-collect) —
    # without it the first timed micro-batch pays the whole JIT bill and the
    # spread metric reads as variance.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        run_batch(transcripts_from_documents(spark, warm_dir), PipelineConfig()).clusters.count()
        wtr = transcripts_from_documents(spark, warm_dir)
        _warm_wh = tempfile.mkdtemp(prefix="rcb_bench_incr_warm_")
        wpipe = IncrementalPipeline(Warehouse(spark, _warm_wh), PipelineConfig())
        wpipe.process_batch(wtr.where(F.abs(F.xxhash64("conv_id")) % 2 == 0))
        wpipe.process_batch(wtr.where(F.abs(F.xxhash64("conv_id")) % 2 == 1))
        shutil.rmtree(_warm_wh, ignore_errors=True)
    _build_incr_template()  # 90% corpus for the micro-batch query (untimed)

    all_runs: dict[str, list[float]] = {name: [] for name, _ in suite}
    counts: dict[str, int] = {}
    for _ in range(N_RUNS):
        for name, fn in suite:
            t0 = time.monotonic()
            c = int(fn())
            all_runs[name].append(round(time.monotonic() - t0, 3))
            prev = counts.setdefault(name, c)
            assert prev == c, f"{name}: count changed across runs ({prev} vs {c})"

    timings = {name: min(runs) for name, runs in all_runs.items()}
    spread = {
        name: round(max(runs) - min(runs), 3) for name, runs in all_runs.items()
    }
    total = round(sum(timings.values()), 3)
    # throughput: transcript turns processed per second by the flagship
    n_turns = transcripts_from_documents(spark, SF_DIR).count()
    # Driver-facing line: totals + best-of ONLY. The r3 line carried per-run
    # and spread arrays for 18 queries and outgrew the driver's tail capture
    # (BENCH_r03 "parsed": null) — the full evidence now lands in a side file
    # instead (per-run arrays, spreads, result counts).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "RUNS_latest.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(
                {
                    "sf": sf_label,
                    "cpus": int(CPUS),
                    "n_runs": N_RUNS,
                    "runs": all_runs,
                    "spread": spread,
                    "counts": counts,
                },
                fh,
                indent=1,
            )
    except OSError:
        pass  # read-only checkout: the summary line below still stands alone
    shutil.rmtree(_incr_template, ignore_errors=True)  # drop the 90% template
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_label,
                "n_runs": N_RUNS,
                "flagship_turns": n_turns,
                "flagship_turns_per_sec": round(n_turns / timings["flagship_pipeline"], 1),
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
