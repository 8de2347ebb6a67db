"""Table state + metrics/lineage sink.

The reference's "sinks" are an unindexed SQLite table plus append-only txt
logs (/root/reference/app.py:28-29,123-125; database.py:97-98,129-130). Here,
state is a warehouse directory of parquet tables behind one small interface:
the method surface is Iceberg-shaped (append / overwrite / merge-style upsert
/ delete-where), so pointing it at a real Iceberg catalog on the cluster is a
local change (the sandbox has no Iceberg jars — noted, not hidden).

Lineage/metrics: every pipeline stage appends rows to ``_metrics``
(run_id, stage, rows_out, partitions, wall_s, extra) — the explicit
per-partition lineage the north rule demands, replacing errs.txt-style logs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return f"{self.root}/{table}"

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def upsert(self, table: str, df: DataFrame, key: str) -> None:
        """MERGE-style idempotent upsert (reference ST5: re-sweeps tolerated
        because the Url probe short-circuits, database.py:328-358).

        Parquet rendering of ``MERGE INTO t USING df ON t.key = df.key WHEN
        MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``: existing rows not
        in df are kept, df wins on key collision. Atomic-enough for the
        sandbox (staging dir + rename); Iceberg gives real snapshot isolation.
        """
        if not self.exists(table):
            self.overwrite(table, df)
            return
        current = self.read(table)
        merged = current.join(df.select(key), key, "left_anti").unionByName(df)
        staged = self._path(f"_staging_{table}_{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(staged)
        final = self._path(table)
        tmp_old = self._path(f"_old_{table}_{uuid.uuid4().hex[:8]}")
        os.rename(final, tmp_old)
        os.rename(staged, final)
        import shutil

        shutil.rmtree(tmp_old, ignore_errors=True)

    def delete_where(self, table: str, condition) -> int:
        """Row-level delete rewritten as filter+rewrite (Iceberg: DELETE FROM).
        Returns rows deleted. Reference analog: retention sweep + dead-link
        deletes (database.py:255-285,88-94,653-658)."""
        if not self.exists(table):
            return 0
        current = self.read(table).cache()
        keep = current.where(~condition)
        n_del = current.count() - keep.count()
        if n_del:
            self.upsert_replace(table, keep)
        current.unpersist()
        return n_del

    def upsert_replace(self, table: str, df: DataFrame) -> None:
        staged = self._path(f"_staging_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(staged)
        final = self._path(table)
        tmp_old = self._path(f"_old_{uuid.uuid4().hex[:8]}")
        os.rename(final, tmp_old)
        os.rename(staged, final)
        import shutil

        shutil.rmtree(tmp_old, ignore_errors=True)


class MetricsSink:
    """Accumulates stage metrics and flushes them to ``_metrics`` parquet."""

    def __init__(self, warehouse: Warehouse, run_id: str | None = None):
        self.warehouse = warehouse
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.rows: list[dict] = []

    def record(self, stage: str, df: DataFrame | None = None, **extra) -> None:
        row = {
            "run_id": self.run_id,
            "stage": stage,
            "wall_s": extra.pop("wall_s", None),
            "rows_out": None,
            "partitions": None,
            "extra": json.dumps(extra, default=str),
            "recorded_at": time.time(),
        }
        if df is not None:
            row["partitions"] = df.rdd.getNumPartitions()
        self.rows.append(row)

    def record_count(self, stage: str, rows_out: int, wall_s: float | None = None, **extra) -> None:
        self.rows.append(
            {
                "run_id": self.run_id,
                "stage": stage,
                "wall_s": wall_s,
                "rows_out": rows_out,
                "partitions": None,
                "extra": json.dumps(extra, default=str),
                "recorded_at": time.time(),
            }
        )

    def flush(self) -> None:
        if not self.rows:
            return
        import pandas as pd

        pdf = pd.DataFrame(self.rows)
        df = self.warehouse.spark.createDataFrame(pdf)
        self.warehouse.append("_metrics", df)
        self.rows = []
