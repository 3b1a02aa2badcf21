#!/usr/bin/env python3
"""spark-submit entrypoint for the incremental crawl-refresh loop.

    spark-submit --master local[N] --py-files dist/ocr_spark.zip \
        jobs/ingest_refresh_job.py check --input /root/testdata/sf0.01 \
        --stats /tmp/corpus_stats --index /tmp/dedup_index
    spark-submit ... jobs/ingest_refresh_job.py commit --input ... \
        --stats ... --index ... --batch-tag crawl-7

check: run the three admission gates (drift quarantine, committed-index
dedup, quality funnel) over the batch slice and print verdict counts.
commit: admit the slice and fold it into BOTH artifacts (idempotent by
--batch-tag). The batch slice is doc_id % 10 == --batch-residue, the
same slicing convention as dedup_index_job. Each mode prints ONE JSON
line on stdout.
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["check", "commit"])
    ap.add_argument("--input", required=True,
                    help="dir containing documents.parquet")
    ap.add_argument("--stats", required=True,
                    help="corpus-stats snapshot dir")
    ap.add_argument("--index", required=True, help="dedup index dir")
    ap.add_argument("--batch-residue", type=int, default=3,
                    help="operate on doc_id %% 10 == residue")
    ap.add_argument("--batch-tag", default=None,
                    help="stable crawl id; a retried commit of the same "
                         "tag is a no-op (required for commit)")
    ap.add_argument("--drift-gate-bp", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("ocr-spark-ingest-refresh")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    try:
        from ocr_spark.pipeline.ingest_refresh import (DRIFT_GATE_BP,
                                                       commit_refresh,
                                                       refresh_verdicts)
        gate = (DRIFT_GATE_BP if args.drift_gate_bp is None
                else args.drift_gate_bp)
        docs = (spark.read.parquet(f"{args.input}/documents.parquet")
                .where(F.col("doc_id").isNotNull()))
        batch = docs.where(
            F.pmod(F.col("doc_id"), F.lit(10)) == args.batch_residue)
        if args.mode == "check":
            t0 = time.time()
            counts = {r.drop_reason or "admitted": r.n for r in
                      refresh_verdicts(spark, args.stats, args.index,
                                       batch, drift_gate_bp=gate)
                      .groupBy("drop_reason")
                      .agg(F.count("*").alias("n")).collect()}
            print(json.dumps({"mode": "check", "verdicts": counts,
                              "wall_ms": int((time.time() - t0) * 1000)},
                             sort_keys=True))
        else:
            if args.batch_tag is None:
                raise SystemExit("--batch-tag is required for commit")
            print(json.dumps(
                commit_refresh(spark, args.stats, args.index, batch,
                               args.batch_tag, drift_gate_bp=gate),
                sort_keys=True))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
