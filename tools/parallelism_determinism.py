"""Cross-parallelism determinism proof for the WHOLE entry surface.

The north rule's two-cluster-size criterion has two halves: throughput
scaling (bench.py --scaling / tools/pipeline_scale.py) and *identical
results* at both cluster sizes. This tool evidences the second half
host-independently: it runs every ``__spark_entry__.queries()`` entry at
two parallelism levels (default local[8] vs local[32]) in two fresh
subprocesses, canonicalizes each result to an order-insensitive multiset
(same canon as tools/check_entry.py — column-name-sorted, row-sorted by
repr), hashes it, and reports per-entry hash equality.

A hash mismatch here means the operator's OUTPUT depends on partition
count — the exact bug class (unstable top-k ties, partition-order
dependence, float reduction order) that makes a job non-portable between
an 8-executor dev run and a 1000-executor production run. Every operator
in this repo is designed to be partition-count-invariant: total
tie-break orderings on top-k, integer fixed-point where reduction order
matters (PageRank), seeded md5 determinism for sampled inits (k-means).

Usage: python tools/parallelism_determinism.py [sf_dir] [--cells 8 32]
       [--only name ...]
Writes tools/parallelism_determinism_r4.json and prints a summary line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

_WORKER = "__msq_det_worker__"


def _canon_hash(df) -> tuple[str, int]:
    """Order-insensitive multiset hash of a pandas frame (check_entry canon)."""
    import numpy as np

    def _cv(v):
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, (np.ndarray, list, tuple)):
            return tuple(_cv(x) for x in v)
        return v

    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        (tuple(_cv(v) for v in t) for t in df.itertuples(index=False)),
        key=repr,
    )
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest(), len(rows)


def worker(sf_dir: str, cores: int, only: list[str], out_path: str) -> None:
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"det_{cores}")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # deliberately ALSO vary the shuffle width with the core count so
        # the proof covers partition-count invariance, not just thread count
        .config("spark.sql.shuffle.partitions", str(cores))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    res: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            pdf = fn(spark, sf_dir).toPandas()
            hx, n = _canon_hash(pdf)
            res[name] = {"hash": hx, "rows": n, "sec": round(time.time() - t0, 2)}
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            res[name] = {"error": f"{type(e).__name__}: {e}"}
        print(f"[{cores}] {name}: {res[name].get('hash', 'ERROR')[:12]} "
              f"({res[name].get('rows', '-')} rows)", flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == _WORKER:
        worker(sys.argv[2], int(sys.argv[3]),
               [a for a in sys.argv[5:]], sys.argv[4])
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cells", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--only", nargs="*", default=[])
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__),
                                      "parallelism_determinism_r4.json")
    )
    args = ap.parse_args()

    per_cell: dict[int, dict] = {}
    for cores in args.cells:
        tmp = f"/tmp/msq_det_{cores}.json"
        t0 = time.time()
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), _WORKER,
             args.sf_dir, str(cores), tmp, *args.only],
            check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        with open(tmp) as f:
            per_cell[cores] = json.load(f)
        print(f"cell local[{cores}] done in {time.time()-t0:.0f}s", flush=True)

    a, b = (per_cell[c] for c in args.cells)
    names = sorted(set(a) | set(b))
    report = {"sf_dir": args.sf_dir, "cells": args.cells, "entries": {}}
    n_match = n_mismatch = n_err = 0
    n_missing = 0
    for name in names:
        ra, rb = a.get(name, {}), b.get(name, {})
        if "error" in ra or "error" in rb:
            report["entries"][name] = {
                "status": "error",
                "err": ra.get("error") or rb.get("error"),
            }
            n_err += 1
        elif not ra or not rb:
            # present in only one cell (e.g. an entry committed between
            # the two runs) — a coverage gap, NOT nondeterminism
            report["entries"][name] = {
                "status": "missing",
                "cell": args.cells[0] if not ra else args.cells[1],
            }
            n_missing += 1
        elif ra.get("hash") == rb.get("hash"):
            report["entries"][name] = {"status": "match", "rows": ra["rows"]}
            n_match += 1
        else:
            report["entries"][name] = {
                "status": "MISMATCH",
                "rows": [ra.get("rows"), rb.get("rows")],
                "hashes": [ra.get("hash"), rb.get("hash")],
            }
            n_mismatch += 1
    report["summary"] = {
        "match": n_match, "mismatch": n_mismatch, "error": n_err,
        "missing": n_missing, "total": len(names),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"]))
    mism = [n for n, v in report["entries"].items() if v["status"] != "match"]
    if mism:
        print("non-matching:", " ".join(mism))
    # a determinism proof that can't fail is no proof: nonzero exit on any
    # real mismatch or errored entry (missing = coverage gap, exit 0)
    if n_mismatch or n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
