"""Two-parallelism scale probe for the pretrain-manifest pipeline.

Complements the index-build scaling ladder (bench.py --scaling) with a
second job shape — scan + fused filter mask + window dedup + split agg —
so the N-vs-4N evidence doesn't rest on a single workload. The corpus is
generated INSIDE Spark with counter-based expressions (no driver
materialization, identical at any parallelism), sized so the filter chain
keeps a majority and the dedup stage genuinely collapses planted
duplicate families.

Usage: python tools/pipeline_scale.py [--docs N(default 60000)] [--n 2] [--repeat 3]
Prints one JSON line per cell plus a summary with scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")


def synth_docs(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(n)
    # ~60-word documents from counter-based token arithmetic; every 9th
    # doc is one of 1000 planted duplicate texts; every 13th doc is made
    # too short so the filter chain drops a deterministic slice
    # modulus must exceed any corpus size (1000003 prime): ids congruent
    # mod it would otherwise generate IDENTICAL texts and the dedup stage
    # would collapse unplanned families
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.col("id") * 61 + i * 977, F.lit(1000003)).cast("string"),
            ),
        ),
        " ",
    )
    dup = F.concat(
        F.lit("the planted duplicate family "),
        F.pmod("id", F.lit(1000)).cast("string"),
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(56)),
                lambda i: F.concat(
                    F.lit("d"), F.pmod(F.pmod("id", F.lit(1000)) * 13 + i, F.lit(997)).cast("string")
                ),
            ),
            " ",
        ),
    )
    text = (
        F.when(F.col("id") % 13 == 0, F.lit("too short"))
        .when(F.col("id") % 9 == 0, dup)
        .otherwise(F.concat(F.lit("the "), words))
    )
    lang = F.when(F.col("id") % 4 == 0, F.lit("en")).otherwise(F.lit("und"))
    return base.select(
        F.col("id").alias("doc_id"), text.alias("text"), lang.alias("lang")
    )


def run_cell(cores: int, n_docs: int) -> dict:
    from marginaliasearch_spark.plans.pretrain import pretrain_manifest
    from marginaliasearch_spark.session import get_spark

    spark = get_spark("pipe_scale", cores=cores, shuffle_partitions=max(cores * 4, 8))
    try:
        docs = synth_docs(spark, n_docs)
        # warmup: JIT/codegen + first-job overheads out of the timed run
        pretrain_manifest(docs.limit(4000)).collect()
        t0 = time.perf_counter()
        rows = pretrain_manifest(docs).collect()
        dt = time.perf_counter() - t0
        total = sum(r["n_docs"] for r in rows)
        checksum = sum(r["id_checksum"] for r in rows)
        return {
            "cores": cores,
            "docs": n_docs,
            "sec": round(dt, 3),
            "docs_per_sec": round(n_docs / dt, 1),
            "manifest_rows": len(rows),
            "kept_docs": int(total),
            "id_checksum": int(checksum),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--cell", type=int, default=None,
                    help="internal: run one cell in-process and print JSON")
    args = ap.parse_args()

    if args.cell is not None:
        print(json.dumps(run_cell(args.cell, args.docs)))
        return

    allruns: dict[int, list[dict]] = {}
    for cores in (args.n, 4 * args.n):
        runs = []
        for _ in range(args.repeat):
            # fresh JVM per rep (same isolation as bench.py --scaling)
            proc = subprocess.run(
                [sys.executable, __file__, "--cell", str(cores),
                 "--docs", str(args.docs)],
                capture_output=True, text=True,
            )
            if proc.returncode != 0:
                # surface the child's Spark stderr — a bare
                # CalledProcessError hides the only diagnostic
                sys.stderr.write(proc.stderr)
                raise SystemExit(f"cell local[{cores}] rep failed "
                                 f"(exit {proc.returncode})")
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            runs.append(json.loads(line))
            print(line, flush=True)
        allruns[cores] = runs
    # determinism across parallelism: identical manifest aggregates
    sigs = {
        (r["manifest_rows"], r["kept_docs"], r["id_checksum"])
        for rs in allruns.values()
        for r in rs
    }
    assert len(sigs) == 1, f"manifest drift across cells: {sigs}"
    tps = {c: [r["docs_per_sec"] for r in rs] for c, rs in allruns.items()}
    n, n4 = args.n, 4 * args.n
    eff_best = (max(tps[n4]) / max(tps[n])) / 4.0
    eff_med = (statistics.median(tps[n4]) / statistics.median(tps[n])) / 4.0
    print(json.dumps({
        "metric": "pretrain-manifest scaling N vs 4N (local threads)",
        "n_cores": n,
        "docs": args.docs,
        "runs": tps,
        "scaling_efficiency": round(eff_best, 3),
        "scaling_efficiency_median": round(eff_med, 3),
        "deterministic_across_cells": True,
    }))


if __name__ == "__main__":
    main()
