"""Driver-simulator: run every queries() entry on Spark AND its oracle_sql()
on DuckDB at sf0.01; compare row counts, column names, and order-insensitive
value hashes. Usage:
python scripts/check_oracles.py [--json PATH] [--vanilla] [name ...]

--json PATH additionally writes a CORRECTNESS-shaped artifact (one object
per checked query: rows/schema/hash match flags + row counts) so the FULL
query surface is recorded in-repo each round, not only the first-50 window
the harness checks.

--vanilla runs the sweep on a DEFAULT-shaped SparkSession instead of the
tuned get_spark() one: no Arrow conversion, no explicit AQE/skew confs,
default 200 shuffle partitions, JVM-default timezone — the round-4 lesson
(the one red CORRECTNESS_r04 row was a conf-DEPENDENCE bug invisible on
the tuned session) turned into a sweepable guarantee. Only spark.ui and
driver memory are set (operational, not semantic).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

# same env override the data-dependent oracles honor (__spark_entry__.py:
# _ORACLE_SF_DIR) — pointing both at another SF keeps the offline
# recomputations comparing against the data the Spark side reads
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, normalize values to strings,
    sort rows, hash."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    import datetime as _dt

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
            s = pd.Timestamp(v).isoformat()
            return s[:10] if s.endswith("T00:00:00") else s
        return str(v)

    rows = sorted("|".join(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(only: list[str], json_path: str | None = None, vanilla: bool = False) -> int:
    import json

    import __spark_entry__ as ent

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle_check_vanilla")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from repostcheckerbot_spark.session import get_spark

        spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                             "spark_rows": None, "oracle_rows": None,
                             "err": f"spark: {type(e).__name__}: {str(e)[:200]}"}
            continue
        el = time.monotonic() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if len(spdf) >= 0 else "EMPTY"
            print(f"ok?   {name}: {len(spdf)} rows ({status}, no oracle) [{el:.1f}s]")
            results[name] = {"rows_match": len(spdf) >= 0, "schema_match": None, "hash_match": None,
                             "spark_rows": len(spdf), "oracle_rows": None, "err": None,
                             "note": "rows-only (no oracle by design)"}
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                             "spark_rows": len(spdf), "oracle_rows": None,
                             "err": f"duckdb: {type(e).__name__}: {str(e)[:200]}"}
            continue
        ok_rows = len(spdf) == len(opdf)
        ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
        ok_hash = ok_cols and value_hash(spdf) == value_hash(opdf)
        results[name] = {"rows_match": ok_rows, "schema_match": ok_cols, "hash_match": ok_hash,
                         "spark_rows": len(spdf), "oracle_rows": len(opdf), "err": None}
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(spdf)} rows [{el:.1f}s]")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(spdf)} vs {len(opdf)}, cols "
                f"{sorted(spdf.columns)} vs {sorted(opdf.columns)}, hash_match={ok_hash}"
            )
            if ok_cols and ok_rows:
                merged_cols = sorted(spdf.columns)
                a = spdf.reindex(merged_cols, axis=1).sort_values(merged_cols).reset_index(drop=True)
                b = opdf.reindex(merged_cols, axis=1).sort_values(merged_cols).reset_index(drop=True)
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  first diffs:")
                print(pd.concat([a[neq].head(3).assign(side="spark"), b[neq].head(3).assign(side="duck")]).to_string())
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {json_path} ({len(results)} queries)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = None
    if "--json" in argv:
        i = argv.index("--json")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    van = "--vanilla" in argv
    if van:
        argv.remove("--vanilla")
    sys.exit(main(argv, json_path=jp, vanilla=van))
