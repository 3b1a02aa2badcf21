#!/usr/bin/env python3
"""spark-submit entrypoint for the persisted corpus-profile snapshot.

    spark-submit --master local[N] --py-files dist/ocr_spark.zip \
        jobs/corpus_stats_job.py build --input /root/testdata/sf0.01 \
        --stats /tmp/corpus_stats
    spark-submit ... jobs/corpus_stats_job.py check --input ... --stats ...

build: profile {input}/documents.parquet (per-source floor-log2
token-length histogram) and commit the snapshot + manifest. check:
profile the input the same way and print per-source drift against the
committed snapshot (TVD basis points + new/vanished coverage). Each
mode prints ONE JSON line on stdout.
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "check"])
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--stats", required=True, help="snapshot artifact dir")
    ap.add_argument("--batch-tag", default="",
                    help="stable crawl/snapshot id recorded in the manifest")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("ocr-spark-corpus-stats")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    try:
        docs = (spark.read.parquet(f"{args.input}/documents.parquet")
                .where(F.col("doc_id").isNotNull()))
        if args.mode == "build":
            from ocr_spark.pipeline.corpus_stats import build_stats
            print(json.dumps(
                build_stats(spark, docs, args.stats, args.batch_tag),
                sort_keys=True))
        else:
            from ocr_spark.pipeline.corpus_stats import drift_check
            t0 = time.time()
            rows = drift_check(spark, args.stats, docs).collect()
            print(json.dumps({
                "mode": "check",
                "n_sources": len(rows),
                "n_new": sum(1 for r in rows if r.status == "new"),
                "n_vanished": sum(1 for r in rows if r.status == "vanished"),
                "max_drift_bp": max(
                    (r.drift_bp for r in rows if r.drift_bp is not None),
                    default=None),
                "wall_ms": int((time.time() - t0) * 1000),
            }, sort_keys=True))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
