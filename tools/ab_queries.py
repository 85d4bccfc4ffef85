"""Interleaved A/B of per-query wall times between two repo trees.

The repo's standard regression protocol (BASELINE.md): reps alternate
A→B→A→B… and each rep is a FRESH subprocess with the uniform warmup
(reader + one positional query — the on-disk entry-index cache makes the
build a resume-no-op after each tree's first rep), so cross-session
tenant drift lands on both arms equally and medians compare code, not
box. Run on an otherwise idle machine.

Usage:
  python tools/ab_queries.py --tree-a /tmp/r2tree --tree-b /root/repo \
      --queries fulltext_bm25_flags,fulltext_bm25_weighted \
      [--reps 5] [--sf-dir /root/testdata/sf0.1] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

RUNNER = r"""
import json, sys, time
tree, sf, names, cores = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, tree)
from marginaliasearch_spark.session import get_spark
import __spark_entry__ as em
spark = get_spark("ab", cores=int(cores), shuffle_partitions=int(cores))
qs = em.queries()
em._get_reader(spark, sf)
qs["fulltext_proximity"](spark, sf).count()
out = {}
for n in names.split(","):
    t0 = time.time()
    qs[n](spark, sf).count()
    out[n] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, sf: str, names: str, cores: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, sf, names, str(cores)],
        capture_output=True,
        text=True,
        cwd=tree,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"runner failed for {tree}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    names = args.queries
    runs: dict[str, list[dict]] = {"a": [], "b": []}
    for rep in range(args.reps):
        for arm, tree in (("a", args.tree_a), ("b", args.tree_b)):
            r = run_tree(tree, args.sf_dir, names, args.cores)
            runs[arm].append(r)
            print(
                f"rep {rep + 1} {arm} ({tree}): {json.dumps(r)}",
                file=sys.stderr,
                flush=True,
            )
    report = {
        "reps": args.reps,
        "sf_dir": args.sf_dir,
        "trees": {"a": args.tree_a, "b": args.tree_b},
        "medians": {
            q: {
                arm: round(
                    statistics.median(r[q] for r in runs[arm]), 3
                )
                for arm in ("a", "b")
            }
            for q in names.split(",")
        },
        "all_runs": runs,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
