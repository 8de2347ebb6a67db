"""Harness-session conf-independence — the round-4 lesson encoded as tests.

queries() entries run on the DRIVER's SparkSession, not on get_spark()'s
tuned one. The r4 CORRECTNESS artifact had exactly one red row
(transcripts_incremental_clusters) whose root cause was session-conf
DEPENDENCE: MetricsSink.flush inferred a schema from a pandas frame with an
all-None column, which raises CANNOT_DETERMINE_TYPE when
``spark.sql.execution.arrow.pyspark.enabled`` is false (the PySpark
DEFAULT, and the driver harness's setting) yet silently succeeds on the
builder's Arrow-enabled session — so every builder-side check was green
while the driver's was red.

These tests run the risky paths under the DRIVER's configuration (Arrow
conversion off, default 200 shuffle partitions) via session-local
``spark.conf`` toggles, and assert result parity with the tuned
configuration where cheap. Spark conf keys here are all runtime-settable,
so toggling on the shared session is exactly equivalent to a fresh
default-config session for these code paths.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_DRIVER_CONF = {
    "spark.sql.execution.arrow.pyspark.enabled": "false",
    "spark.sql.shuffle.partitions": "200",
}


@contextmanager
def driver_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _DRIVER_CONF}
    try:
        for k, v in _DRIVER_CONF.items():
            spark.conf.set(k, v)
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_metrics_flush_without_arrow(spark, tmp_path):
    """MetricsSink.flush must not depend on type inference: a run whose
    every row leaves an optional field None (the record_count shape that
    broke r4) flushes fine with Arrow conversion off."""
    from repostcheckerbot_spark.sinks.state import MetricsSink, Warehouse

    with driver_conf(spark):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        m = MetricsSink(wh, run_id="t_flush")
        m.record_count("stage_a", rows_out=3)  # wall_s stays None
        m.record_count("stage_b", rows_out=0, wall_s=None, note="x")
        m.flush()
        got = wh.read("_metrics").orderBy("stage").collect()
    assert [r["stage"] for r in got] == ["stage_a", "stage_b"]
    assert got[0]["rows_out"] == 3 and got[0]["wall_s"] is None


def test_incremental_micro_batch_without_arrow(spark, tmp_path):
    """One IncrementalPipeline micro-batch end-to-end (ingest → probe →
    edges → CC → metrics flush) under the exact driver configuration that
    produced the r4 CANNOT_DETERMINE_TYPE error."""
    from repostcheckerbot_spark.config import PipelineConfig
    from repostcheckerbot_spark.operators.ingest import IncrementalPipeline
    from repostcheckerbot_spark.sinks.state import Warehouse
    from repostcheckerbot_spark.sources.testdata import transcripts_from_documents

    with driver_conf(spark):
        tr = transcripts_from_documents(spark, SF)
        pipe = IncrementalPipeline(Warehouse(spark, str(tmp_path / "wh")), PipelineConfig(thresh=0))
        out = pipe.process_batch(tr.where(F.abs(F.xxhash64("conv_id")) % 4 == 0))
        assert out["clusters"].count() > 0
        # the flush side-channel wrote rows (this is where r4 died)
        assert pipe.wh.read("_metrics").count() > 0


# the conf-sensitive surface: the fixed flush path, the new wide-PPRL path,
# every driver fast path that builds DataFrames on the driver
# (createDataFrame), and a pandas-UDF scorer (pandas UDFs use Arrow
# REGARDLESS of the conversion conf — asserted by running one)
_REPRESENTATIVE = [
    "transcripts_incremental_clusters",
    "pprl_clk_linkage_wide",
    "threshold_cluster_ladder",
    "fs_threshold_sweep",
    "jaro_winkler_pairs",
]


@pytest.mark.parametrize("name", _REPRESENTATIVE)
def test_queries_run_identically_under_driver_conf(spark, name):
    """Representative queries() entries return the SAME row count under the
    driver's default-shaped conf as under the tuned one (full value parity
    vs DuckDB is check_oracles.py's job; this pins conf-independence)."""
    import __spark_entry__ as ent

    fn = ent.queries()[name]
    tuned = fn(spark, SF).count()
    with driver_conf(spark):
        vanilla = fn(spark, SF).count()
    assert vanilla == tuned and tuned >= 0
