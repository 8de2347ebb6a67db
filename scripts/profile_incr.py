"""Job-level profile of one incremental micro-batch (guide §1).

Reproduces bench.py's incremental_microbatch setup (90% corpus template,
timed 10% batch against a cloned warehouse) with the Spark event log on,
then parses JobStart/JobEnd events for the timed window: per-job wall,
description, and inter-job gaps — so the driver-floor share of the batch
is measurable rather than guessed.

Usage: python scripts/profile_incr.py [n_batches]
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


def main() -> None:
    from pyspark.sql import functions as F

    from repostcheckerbot_spark.config import PipelineConfig
    from repostcheckerbot_spark.operators.ingest import IncrementalPipeline
    from repostcheckerbot_spark.session import get_spark
    from repostcheckerbot_spark.sinks.state import Warehouse
    from repostcheckerbot_spark.sources.testdata import transcripts_from_documents

    evt_dir = tempfile.mkdtemp(prefix="rcb_prof_evt_")
    spark = get_spark(
        app_name="rcb_profile_incr",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext

    tr = transcripts_from_documents(spark, SF_DIR)
    big = tr.where(F.abs(F.xxhash64("conv_id")) % 10 != 0)
    small = tr.where(F.abs(F.xxhash64("conv_id")) % 10 == 0)

    tpl = tempfile.mkdtemp(prefix="rcb_prof_incr_tpl_")
    IncrementalPipeline(Warehouse(spark, tpl), PipelineConfig()).process_batch(big)

    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        wtpl = tempfile.mkdtemp(prefix="rcb_prof_incr_warm_")
        wtr = transcripts_from_documents(spark, warm)
        IncrementalPipeline(Warehouse(spark, wtpl), PipelineConfig()).process_batch(wtr)
        shutil.rmtree(wtpl, ignore_errors=True)

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    windows = []

    for i in range(n_batches):
        wh_dir = tempfile.mkdtemp(prefix="rcb_prof_incr_run_")
        shutil.rmtree(wh_dir)
        t_copy0 = time.monotonic()
        shutil.copytree(tpl, wh_dir)
        t_copy = time.monotonic() - t_copy0

        pipe = IncrementalPipeline(Warehouse(spark, wh_dir), PipelineConfig())
        t0_ms = int(time.time() * 1000)
        t0 = time.monotonic()
        out = pipe.process_batch(small)
        n = out["clusters"].where(F.col("conv_id") != F.col("cluster_id")).count()
        wall = time.monotonic() - t0
        t1_ms = int(time.time() * 1000)
        laps = [
            (r["stage"], r["wall_s"], r["rows_out"])
            for r in Warehouse(spark, wh_dir)
            .read("_metrics")
            .orderBy("recorded_at")
            .collect()
            if r["wall_s"] is not None
        ]
        windows.append((i, t0_ms, t1_ms, wall, t_copy, n, laps))
        shutil.rmtree(wh_dir, ignore_errors=True)

    sc.stop()

    # parse the event log for the timed windows (Spark 4 may write a rolling
    # eventlog_v2_* DIRECTORY of events_* part files)
    logs = []
    for f in sorted(os.listdir(evt_dir)):
        p = os.path.join(evt_dir, f)
        if os.path.isdir(p):
            logs += [os.path.join(p, g) for g in sorted(os.listdir(p)) if g.startswith("events")]
        else:
            logs.append(p)
    events = []
    for lp in logs:
        with open(lp) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") in ("SparkListenerJobStart", "SparkListenerJobEnd"):
                    events.append(e)

    starts = {e["Job ID"]: e for e in events if e["Event"] == "SparkListenerJobStart"}
    ends = {e["Job ID"]: e for e in events if e["Event"] == "SparkListenerJobEnd"}

    for i, t0_ms, t1_ms, wall, t_copy, n, laps in windows:
        jobs = []
        for jid, s in sorted(starts.items()):
            if s["Submission Time"] < t0_ms or s["Submission Time"] > t1_ms:
                continue
            e = ends.get(jid)
            if e is None:
                continue
            desc = s.get("Properties", {}).get("spark.job.description", "")
            cs = s.get("Properties", {}).get("callSite.short", "")
            jobs.append(
                {
                    "jid": jid,
                    "sub": s["Submission Time"],
                    "end": e["Completion Time"],
                    "wall_s": round((e["Completion Time"] - s["Submission Time"]) / 1000, 3),
                    "desc": (desc or cs)[:90],
                }
            )
        jobs.sort(key=lambda j: j["sub"])
        total_job = sum(j["wall_s"] for j in jobs)
        gaps = 0.0
        for a, b in zip(jobs, jobs[1:]):
            gaps += max(0, b["sub"] - a["end"]) / 1000
        lead = (jobs[0]["sub"] - t0_ms) / 1000 if jobs else 0
        tail = (t1_ms - jobs[-1]["end"]) / 1000 if jobs else 0
        print(
            json.dumps(
                {
                    "run": i,
                    "wall_s": round(wall, 3),
                    "copytree_s": round(t_copy, 3),
                    "n_jobs": len(jobs),
                    "sum_job_wall_s": round(total_job, 3),
                    "inter_job_gaps_s": round(gaps, 3),
                    "lead_s": round(lead, 3),
                    "tail_s": round(tail, 3),
                    "clusters_nontrivial": n,
                }
            ),
            flush=True,
        )
        for j in jobs:
            print(f"  job {j['jid']:>4} {j['wall_s']:7.3f}s  {j['desc']}", flush=True)
        for stage, ws, rows in laps:
            print(f"  lap {ws:7.3f}s  {stage} rows={rows}", flush=True)

    shutil.rmtree(evt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
