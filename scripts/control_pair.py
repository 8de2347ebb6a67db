"""Same-window control experiment (the BENCH/BASELINE.md methodology for
separating substrate drift from code change): run the identical flagship job
at the SAME parallelism level, INTERLEAVED, from two source trees — the
current repo and a control checkout (e.g. a git worktree at the previous
round's commit). If the two alternate within a few percent while absolute
numbers sit below a previous window, the delta is host co-tenancy, not plan.

Usage:
    python scripts/control_pair.py /tmp/rcb_r3_control 8 2
    # control_tree cores rounds  → interleaves [current, control] × rounds
"""

from __future__ import annotations

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> None:
    control = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sb = importlib.import_module("scaling_bench")

    corpus = sb.ensure_corpus()
    import tempfile

    results: dict[str, list[dict]] = {"current": [], "control": []}
    trees = [("current", REPO), ("control", control)]
    tmp = tempfile.mkdtemp(prefix="rcb_ctrl_")
    jobs = {}
    for name, tree in trees:
        job_path = os.path.join(tmp, f"job_{name}.py")
        zip_path = os.path.join(tmp, f"rcb_{name}.zip")
        with open(job_path, "w") as f:
            f.write(sb.JOB)
        # build the zip from each tree's package
        import zipfile

        with zipfile.ZipFile(zip_path, "w") as z:
            pkg = os.path.join(tree, "repostcheckerbot_spark")
            for root, _, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, tree))
        jobs[name] = (job_path, zip_path)

    for r in range(rounds):
        for name, _tree in trees:
            job_path, zip_path = jobs[name]
            res = sb.run_at(cores, job_path, zip_path, corpus)
            results[name].append(res)
            print(f"{name} run {r + 1}: {res}", flush=True)

    for name in results:
        best = min(results[name], key=lambda x: x["wall_s"])
        print(f"best {name}: {best['wall_s']} s  {best['turns_per_sec']} turns/s")


if __name__ == "__main__":
    main()
