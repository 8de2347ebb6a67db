"""Component-level profiling harness for the optimization round (guide §1).

NOT the driver bench — `bench.py` is frozen. This file isolates the expensive
queries and their internal stages with the noop sink so we time computation,
not the sink, and so before/after numbers for OPTIMIZATION_r06.md come from
one methodology.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [name ...]

With no args, runs every component once and prints one JSON line per
component: {"name": ..., "sec": ..., "rows": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as ent
    from repostcheckerbot_spark.operators import dedup_docs
    from repostcheckerbot_spark.session import get_spark
    from repostcheckerbot_spark.sources.testdata import load

    spark = get_spark(
        app_name="rcb_bench_extra", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    q = ent.queries()

    def docs():
        return load(spark, SF_DIR, "documents")

    # --- simhash family internals -------------------------------------------
    def simhash_sigs_only():
        return dedup_docs.simhash64(docs())

    def simhash_near_pairs_full():
        return dedup_docs.simhash_near_pairs(docs(), max_hamming=8)

    def threshold_ladder_full():
        return q["threshold_cluster_ladder"](spark, SF_DIR)

    components: dict[str, object] = {
        "simhash_sigs_only": simhash_sigs_only,
        "simhash_near_pairs_full": simhash_near_pairs_full,
        "threshold_ladder_full": threshold_ladder_full,
        # headline queries, noop-sunk
        "flagship_rows": lambda: None,  # flagship is an action pipeline; bench.py times it
        "minhash_lsh_md5": lambda: q["lsh_candidates"](spark, SF_DIR),
        "tfidf_canopy": lambda: None,
        "pprl_clk_linkage": lambda: q["pprl_clk_linkage"](spark, SF_DIR),
        "pprl_clk_linkage_wide": lambda: q["pprl_clk_linkage_wide"](spark, SF_DIR),
        "fs_linkage": lambda: q["fs_linkage"](spark, SF_DIR),
        "bm25_scores": lambda: q["bm25_scores"](spark, SF_DIR),
        "decontamination": lambda: q["decontamination"](spark, SF_DIR),
        "pack_manifest": lambda: q["pack_manifest"](spark, SF_DIR),
        "cosine_topk_bruteforce": lambda: q["cosine_topk_bruteforce"](spark, SF_DIR),
        "cosine_topk_lsh": lambda: q["cosine_topk_lsh"](spark, SF_DIR),
        "cosine_topk_ivf": lambda: q["cosine_topk_ivf"](spark, SF_DIR),
        "exact_dedup": lambda: q["dedup_keep_first"](spark, SF_DIR),
        "simhash": lambda: q["simhash"](spark, SF_DIR),
        "q1_pricing_summary": lambda: q["q1_pricing_summary"](spark, SF_DIR),
        "events_ts_buckets": lambda: q["events_ts_buckets"](spark, SF_DIR),
        "token_stats": lambda: q["token_stats"](spark, SF_DIR),
    }

    def tfidf_canopy_df():
        from repostcheckerbot_spark.operators.er import tfidf_cosine_pairs

        return tfidf_cosine_pairs(docs(), n=2, min_cosine=0.6, max_df_frac=0.02)

    components["tfidf_canopy"] = tfidf_canopy_df

    def lsh_candidates_xxhash_df():
        from repostcheckerbot_spark.config import PipelineConfig
        from repostcheckerbot_spark.operators.assembly import assemble_docs
        from repostcheckerbot_spark.operators.blocking import generate_candidates
        from repostcheckerbot_spark.sources.testdata import transcripts_from_documents

        tr = transcripts_from_documents(spark, SF_DIR)
        cands, _ = generate_candidates(assemble_docs(tr), PipelineConfig())
        return cands

    components["lsh_candidates_xxhash"] = lsh_candidates_xxhash_df
    del components["flagship_rows"]

    names = sys.argv[1:] or list(components)
    # warmup: spin up JVM/Python workers on the tiny SF
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        noop(dedup_docs.simhash_near_pairs(load(spark, warm, "documents"), max_hamming=8))

    for name in names:
        fn = components[name]
        best = None
        for _ in range(N_RUNS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn()
            noop(df)
            dt = round(time.monotonic() - t0, 3)
            best = dt if best is None else min(best, dt)
        print(json.dumps({"name": name, "sec": best, "sf": SF_DIR}), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
