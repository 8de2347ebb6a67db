"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the actual entity-resolution workload (flagship pipeline over
derived transcripts: assembly → MinHash-LSH → difflib scoring → CC) plus the
heavier standalone operators (LSH candidates, simhash, exact dedup, ANN,
TPC-H-style agg). Run `python scripts/scaling_bench.py` for the local[8] vs
local[32] scaling-efficiency evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


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
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        counts[name] = int(fn())
        timings[name] = round(time.monotonic() - t0, 3)

    # flagship: the full ER pipeline (count forces full materialization)
    def flagship():
        tr = transcripts_from_documents(spark, SF_DIR)
        res = run_batch(tr, PipelineConfig())
        return res.clusters.where(F.col("conv_id") != F.col("cluster_id")).count()

    def lsh_candidates():
        docs = assemble_docs(transcripts_from_documents(spark, SF_DIR))
        cands, _ = generate_candidates(docs, PipelineConfig())
        return cands.count()

    run("flagship_pipeline", flagship)
    run("lsh_candidates_xxhash", lsh_candidates)
    run("exact_dedup", lambda: q["dedup_keep_first"](spark, SF_DIR).count())
    run("simhash", lambda: q["simhash"](spark, SF_DIR).count())
    run("simhash_near_pairs", lambda: q["simhash_near_pairs"](spark, SF_DIR).count())
    run("minhash_lsh_md5", lambda: q["lsh_candidates"](spark, SF_DIR).count())
    run("cosine_topk_bruteforce", lambda: q["cosine_topk_bruteforce"](spark, SF_DIR).count())
    run("cosine_topk_lsh", lambda: q["cosine_topk_lsh"](spark, SF_DIR).count())
    run("cosine_topk_ivf", lambda: q["cosine_topk_ivf"](spark, SF_DIR).count())
    run("q1_pricing_summary", lambda: q["q1_pricing_summary"](spark, SF_DIR).count())
    run("token_stats", lambda: q["token_stats"](spark, SF_DIR).count())
    run("events_ts_buckets", lambda: q["events_ts_buckets"](spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    # throughput: transcript turns processed per second by the flagship
    n_turns = transcripts_from_documents(spark, SF_DIR).count()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_label,
                "counts": counts,
                "flagship_turns": n_turns,
                "flagship_turns_per_sec": round(n_turns / timings["flagship_pipeline"], 1),
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
