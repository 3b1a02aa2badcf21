#!/usr/bin/env python3
"""spark-submit entrypoint: extraction → star-schema import, end to end.

    spark-submit --master local[N] --py-files dist/ocr_spark.zip \
        jobs/import_job.py --n-convs 5000 --output /tmp/star \
        [--transcripts DIR] [--salt P] [--type purchase|sale]

Reads transcripts from --transcripts (parquet) or synthesizes them
deterministically, runs the extraction stage, then materializes the
star schema with pipeline.importer.write_import — purchase
(suppliers/products/purchases/product_purchases/rejects) or sale
(customers/products/sales/product_sales/rejects), dispatched like
public/preview.php:114-122. Prints ONE JSON line of table row counts
+ wall time.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=5000)
    ap.add_argument("--transcripts", default=None,
                    help="parquet dir of transcripts; default: synthesize")
    ap.add_argument("--output", required=True)
    ap.add_argument("--salt", type=int, default=None)
    ap.add_argument("--type", dest="draft_type", default="purchase",
                    choices=("purchase", "sale"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_spark.pipeline.extract import extract_turns
    from ocr_spark.pipeline.importer import write_import
    from ocr_spark.sources.readers import read_transcripts
    from ocr_spark.sources.synthetic import synthesize_transcripts

    spark = (SparkSession.builder.appName("ocr-spark-import")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    if args.transcripts:
        t = read_transcripts(spark, args.transcripts)
    else:
        t = synthesize_transcripts(spark, n_convs=args.n_convs)

    t0 = time.time()
    extracted = extract_turns(t, salt_partitions=args.salt)
    counts = write_import(extracted, args.output, args.draft_type)
    print(json.dumps({
        "type": args.draft_type,
        "tables": counts,
        "wall_sec": round(time.time() - t0, 3),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
