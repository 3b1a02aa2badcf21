#!/usr/bin/env python3
"""spark-submit entrypoint for the persisted LSH ANN index.

    spark-submit --master local[N] --py-files dist/ocr_spark.zip \
        jobs/ann_index_job.py build --input /root/testdata/sf0.01 \
        --index /tmp/ann_index
    spark-submit --master local[N] --py-files dist/ocr_spark.zip \
        jobs/ann_index_job.py query --input /root/testdata/sf0.01 \
        --index /tmp/ann_index --n-queries 5 --k 10

build: code every vector of {input}/embeddings.parquet and commit the
bucket-partitioned index + manifest. query: run the first --n-queries
vectors (by vec_id) through the index and print the neighbor rows.
Each mode prints ONE JSON line on stdout.
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query"])
    ap.add_argument("--input", required=True,
                    help="dir containing embeddings.parquet")
    ap.add_argument("--index", required=True, help="index artifact dir")
    ap.add_argument("--n-queries", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("ocr-spark-ann-index")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    try:
        emb = (spark.read.parquet(f"{args.input}/embeddings.parquet")
               .where(F.col("vec_id").isNotNull()
                      & F.col("embedding").isNotNull()))
        if args.mode == "build":
            from ocr_spark.pipeline.ann_index import build_lsh_index
            manifest = build_lsh_index(spark, emb, args.index)
            print(json.dumps(manifest, sort_keys=True))
        else:
            from ocr_spark.pipeline.ann_index import query_lsh_index
            t0 = time.time()
            queries = (emb.where(F.col("vec_id") < args.n_queries)
                       .select(F.col("vec_id").alias("query_id"),
                               "embedding"))
            rows = query_lsh_index(spark, args.index, queries,
                                   k=args.k).collect()
            print(json.dumps({
                "n_queries": args.n_queries, "k": args.k,
                "n_result_rows": len(rows),
                "wall_ms": int((time.time() - t0) * 1000),
                "results": [[r.query_id, r.rank, r.cand_id, r.cosine]
                            for r in rows],
            }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
