"""spark-submit entry point: build the full inverted index as a cluster job.

The package ships to executors via ``--py-files`` (see ``tools/submit.sh``);
the session inherits ``--master`` / executor topology from spark-submit, so
the same script runs unchanged on local[N] and a real cluster:

    bash tools/submit.sh local[8]  --convs 45000
    bash tools/submit.sh yarn      --input s3://bucket/transcripts

Prints ONE JSON line: {"build": {"turns": N, "sec": s, "turns_per_sec": r}}.
``--warmup`` first runs a small throwaway build (absorbs python-worker spawn
+ JIT, which a long-running cluster amortizes) so the timed number reflects
steady-state throughput.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

RUNTIME_CONF = {
    # runtime-settable tuning (driver memory etc. belong in submit.sh)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet dir of transcript turns")
    ap.add_argument("--convs", type=int, default=45_000)
    ap.add_argument("--turns-per-conv", type=int, default=10)
    ap.add_argument("--workdir", help="index output root (default: temp dir)")
    ap.add_argument("--n-buckets", type=int, default=1)
    ap.add_argument("--warmup", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("msq-index-build").getOrCreate()
    for k, v in RUNTIME_CONF.items():
        spark.conf.set(k, v)
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, 2 * cores)))
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER session start: on a cluster the package arrives via
    # --py-files and must resolve on executors as well
    from marginaliasearch_spark.operators.index_build import build_index
    from marginaliasearch_spark.sources.transcripts import zipf_corpus

    def corpus(n_convs: int):
        if args.input:
            return spark.read.parquet(args.input)
        return zipf_corpus(
            spark, n_convs=n_convs, turns_per_conv=args.turns_per_conv
        )

    if args.warmup:
        wdir = tempfile.mkdtemp(prefix="msq_warm_")
        try:
            build_index(spark, corpus(2_000), wdir, n_buckets=1)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    workdir = args.workdir or tempfile.mkdtemp(prefix="msq_submit_idx_")
    if args.input:
        n_turns = corpus(0).count()
    else:
        n_turns = args.convs * args.turns_per_conv
    t0 = time.time()
    build_index(spark, corpus(args.convs), workdir, n_buckets=args.n_buckets)
    sec = time.time() - t0
    print(
        json.dumps(
            {
                "build": {
                    "turns": n_turns,
                    "sec": round(sec, 3),
                    "turns_per_sec": round(n_turns / sec, 1),
                },
                "cores": cores,
                "workdir": workdir,
            }
        )
    )
    if not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
