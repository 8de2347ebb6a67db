"""Stage-level profile of one headline query (guide §1): runs the query with
the event log on and prints each stage's wall, executor-CPU sum, task count
and shuffle volumes, plus per-job totals — the attribution the Spark UI would
give, in a UI-less sandbox.

Usage: python scripts/profile_stages.py <component> [n_runs]
Components: flagship, lsh_candidates, ladder, tfidf, incremental, simhash_np,
minhash, bm25, fs_linkage, cosine_lsh
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as ent
    from repostcheckerbot_spark.config import PipelineConfig
    from repostcheckerbot_spark.operators.assembly import assemble_docs
    from repostcheckerbot_spark.operators.blocking import generate_candidates
    from repostcheckerbot_spark.pipeline import run_batch
    from repostcheckerbot_spark.session import get_spark
    from repostcheckerbot_spark.sources.testdata import load, transcripts_from_documents

    evt_dir = tempfile.mkdtemp(prefix="rcb_prof_evt_")
    spark = get_spark(
        app_name="rcb_profile_stages",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    q = ent.queries()

    def flagship():
        tr = transcripts_from_documents(spark, SF_DIR)
        res = run_batch(tr, PipelineConfig())
        return res.clusters.where(F.col("conv_id") != F.col("cluster_id")).count()

    def lsh_candidates():
        docs = assemble_docs(transcripts_from_documents(spark, SF_DIR))
        cands, _ = generate_candidates(docs, PipelineConfig())
        return cands.count()

    def tfidf():
        from repostcheckerbot_spark.operators.er import tfidf_cosine_pairs

        d = load(spark, SF_DIR, "documents")
        return tfidf_cosine_pairs(d, n=2, min_cosine=0.6, max_df_frac=0.02).count()

    components = {
        "flagship": flagship,
        "lsh_candidates": lsh_candidates,
        "tfidf": tfidf,
        "ladder": lambda: q["threshold_cluster_ladder"](spark, SF_DIR).count(),
        "simhash_np": lambda: q["simhash_near_pairs"](spark, SF_DIR).count(),
        "minhash": lambda: q["lsh_candidates"](spark, SF_DIR).count(),
        "bm25": lambda: q["bm25_scores"](spark, SF_DIR).count(),
        "fs_linkage": lambda: q["fs_linkage"](spark, SF_DIR).count(),
        "cosine_lsh": lambda: q["cosine_topk_lsh"](spark, SF_DIR).count(),
    }

    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    fn = components[name]

    # warmup on tiny SF for JIT + python workers
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        run_batch(transcripts_from_documents(spark, warm), PipelineConfig()).clusters.count()

    windows = []
    for i in range(n_runs):
        t0_ms = int(time.time() * 1000)
        t0 = time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        t1_ms = int(time.time() * 1000)
        windows.append((i, t0_ms, t1_ms, wall, out))

    sc.stop()

    logs = []
    for f in sorted(os.listdir(evt_dir)):
        p = os.path.join(evt_dir, f)
        if os.path.isdir(p):
            logs += [os.path.join(p, g) for g in sorted(os.listdir(p)) if g.startswith("events")]
        else:
            logs.append(p)
    stage_sub = {}
    stage_done = []
    jobs = []
    for lp in logs:
        with open(lp) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stage_done.append(si)
                elif ev == "SparkListenerJobStart":
                    jobs.append(e)

    for i, t0_ms, t1_ms, wall, out in windows:
        print(json.dumps({"run": i, "wall_s": round(wall, 3), "result": out}), flush=True)
        rows = []
        for si in stage_done:
            sub = si.get("Submission Time")
            done = si.get("Completion Time")
            if sub is None or done is None or sub < t0_ms or sub > t1_ms:
                continue
            cpu = 0.0
            sread = swrite = inbytes = 0
            # task metrics are not aggregated in StageCompleted; use
            # accumulables when present
            for acc in si.get("Accumulables", []):
                n2 = acc.get("Name", "")
                v = acc.get("Value", 0)
                try:
                    v = int(v)
                except (TypeError, ValueError):
                    continue
                if n2 == "internal.metrics.executorCpuTime":
                    cpu = v / 1e9
                elif n2 == "internal.metrics.shuffle.read.remoteBytesRead":
                    sread += v
                elif n2 == "internal.metrics.shuffle.read.localBytesRead":
                    sread += v
                elif n2 == "internal.metrics.shuffle.write.bytesWritten":
                    swrite = v
                elif n2 == "internal.metrics.input.bytesRead":
                    inbytes = v
            rows.append(
                {
                    "stage": si["Stage ID"],
                    "wall_s": round((done - sub) / 1000, 3),
                    "cpu_s": round(cpu, 2),
                    "tasks": si.get("Number of Tasks"),
                    "sread_mb": round(sread / 1e6, 1),
                    "swrite_mb": round(swrite / 1e6, 1),
                    "in_mb": round(inbytes / 1e6, 1),
                    "name": si.get("Stage Name", "")[:70],
                }
            )
        rows.sort(key=lambda r: -r["wall_s"])
        for r in rows[:25]:
            print(
                f"  stage {r['stage']:>4} wall {r['wall_s']:7.3f}s cpu {r['cpu_s']:8.2f}s "
                f"tasks {r['tasks']:>3} sread {r['sread_mb']:8.1f}MB swrite {r['swrite_mb']:8.1f}MB "
                f"in {r['in_mb']:8.1f}MB  {r['name']}",
                flush=True,
            )

    shutil.rmtree(evt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
