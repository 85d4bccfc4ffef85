"""Head-term skew proof at ~10x sf0.1 scale (SURVEY §8 risk 4).

Builds a 2M-turn / ~80M-token-occurrence Zipf corpus (head term df ~=
corpus size — the stopword shape), stages the real journal, and measures
the ACTUAL per-partition row distribution of the postings shuffle two
ways:

- shipped path: ``repartitionByRange(P, term_id, doc_id)`` — the
  composite range key splits a head term across partitions at doc_id
  boundaries (range salting without a salt column; blocks of one term
  from many partitions are unioned by the query-side decode);
- naive path: ``repartition(P, term_id)`` — hash on the bare term key,
  which must put each term's whole posting list on one reducer.

Prints a JSON report: partition-size stats (max/median/p99/stddev) for
both, the head terms' df/N, and how many range partitions each head
term's postings landed in. Optionally (--build) runs the full
``build_index`` at this scale to prove the pipeline completes, recording
wall time with host-health context.

Usage: python tools/skew_proof.py [--convs 200000] [--partitions 64]
       [--build]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def partition_stats(df, label: str) -> dict:
    import numpy as np

    sizes = (
        df.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .toPandas()["count"]
        .to_numpy()
    )
    sizes = np.sort(sizes)
    return {
        "label": label,
        "n_partitions_nonempty": int(len(sizes)),
        "rows": int(sizes.sum()),
        "max": int(sizes.max()),
        "p99": int(np.percentile(sizes, 99)),
        "median": int(np.median(sizes)),
        "mean": float(round(sizes.mean(), 1)),
        "stddev": float(round(sizes.std(), 1)),
        "max_over_median": float(round(sizes.max() / np.median(sizes), 2)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=200_000)
    ap.add_argument("--turns", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--build", action="store_true")
    ap.add_argument(
        "--journal",
        default=None,
        help="reuse an already-staged journal dir (skip corpus+staging)",
    )
    args = ap.parse_args()

    import bench
    from marginaliasearch_spark.operators import ingest
    from marginaliasearch_spark.session import get_spark
    from marginaliasearch_spark.sources.transcripts import zipf_corpus

    report: dict = {
        "turns": args.convs * args.turns,
        "partitions": args.partitions,
        "host_before": bench._host_probe(),
    }
    spark = get_spark(
        "skew_proof", cores=32, shuffle_partitions=args.partitions
    )

    # stage the journal once (the tokenize/assembly cost is not the
    # subject here; the shuffle distribution is)
    workdir = tempfile.mkdtemp(prefix="skew_")
    corpus = zipf_corpus(
        spark, n_convs=args.convs, turns_per_conv=args.turns
    )
    if args.journal:
        jpath = args.journal
    else:
        t0 = time.time()
        jpath = f"{workdir}/journal"
        ingest.build_journal(corpus).write.mode("overwrite").parquet(jpath)
        report["journal_stage_s"] = round(time.time() - t0, 1)
    journal = spark.read.parquet(jpath)
    terms = journal.filter(F.col("term").isNotNull()).select(
        "term_id", "doc_id"
    )

    # head-term profile: df of the top terms vs corpus doc count
    n_docs = journal.select("doc_id").distinct().count()
    head = (
        terms.groupBy("term_id")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"))
        .limit(5)
        .toPandas()
    )
    report["n_docs"] = n_docs
    report["head_terms"] = [
        {"term_id": int(r.term_id), "df": int(r.df),
         "df_over_n": round(r.df / n_docs, 4)}
        for r in head.itertuples()
    ]

    P = args.partitions
    ranged = terms.repartitionByRange(P, "term_id", "doc_id")
    hashed = terms.repartition(P, "term_id")
    t0 = time.time()
    report["ranged"] = partition_stats(
        ranged, "repartitionByRange(term_id, doc_id)  [shipped]"
    )
    report["ranged"]["measure_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    report["hashed"] = partition_stats(
        hashed, "repartition(term_id)  [naive baseline]"
    )
    report["hashed"]["measure_s"] = round(time.time() - t0, 1)

    # salting engagement: the head terms' postings must span MANY range
    # partitions (doc_id-boundary splits), not one reducer
    head_ids = [int(r.term_id) for r in head.itertuples()]
    spans = (
        ranged.select(
            "term_id", F.spark_partition_id().alias("p")
        )
        .where(F.col("term_id").isin(head_ids))
        .groupBy("term_id")
        .agg(F.countDistinct("p").alias("n_partitions"))
        .toPandas()
    )
    report["head_term_partition_spans"] = {
        int(r.term_id): int(r.n_partitions) for r in spans.itertuples()
    }

    if args.build:
        from marginaliasearch_spark.operators.index_build import build_index

        t0 = time.time()
        build_index(spark, corpus, f"{workdir}/index", n_buckets=4)
        report["full_build_s"] = round(time.time() - t0, 1)
        report["build_turns_per_sec"] = round(
            args.convs * args.turns / report["full_build_s"], 1
        )

    report["host_after"] = bench._host_probe()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
