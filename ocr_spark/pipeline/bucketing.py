"""Bucketed-table layout for co-located joins (task brief: "bucketing
for co-located joins").

When two tables are bucketed (and sorted) by the same key into the same
bucket count, Spark's scan exposes the hash-partitioning to the planner
and the join needs NO exchange — at 100 TB this turns the nightly
fact-to-fact join from the dominant shuffle into a zipper merge. The
extraction output's analog: bucket extracted_turns and the transcripts
table by conv_id so turn-level joins (e.g. re-attaching raw text to
extracted records) are shuffle-free.

parquet `save` cannot carry bucket metadata — bucketBy requires a table
in the session catalog (saveAsTable); the warehouse is a local dir here,
a real metastore on a cluster."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16) -> None:
    """Persist df as a bucketed+sorted catalog table keyed for
    co-located joins."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .format("parquet")
     .saveAsTable(table))


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan is scan → sort-merge join with ZERO
    Exchange nodes (assert via ocr_spark.plans.exchange_count)."""
    return (spark.table(left_table)
            .join(spark.table(right_table), key))
