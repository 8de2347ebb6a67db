"""Dump .explain('formatted') for named declared queries to plans/<round>/.

Usage: python scripts/dump_plan.py r06 before simhash_near_pairs threshold_cluster_ladder ...
Writes plans/<round>/<query>_<tag>.txt. Uses the default-conf-shaped session
from repostcheckerbot_spark.session (same as bench.py) at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    import __spark_entry__ as ent
    from repostcheckerbot_spark.session import get_spark

    spark = get_spark(
        app_name="rcb_plans", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    q = ent.queries()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = q[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
