"""SparkSession factory tuned for the extraction workload.

Design notes (scale posture — SURVEY.md §4):
- AQE on: runtime coalesce of post-shuffle partitions and skew-join
  handling for the relational operator layer.
- Arrow enabled with a bounded batch size so giant transcript payloads
  cannot blow the Python worker (SURVEY §7.3.4); the extraction stage uses
  Iterator[pandas.DataFrame] so per-batch kernel setup (compiled regexes)
  is amortized across batches.
- shuffle partitions default to 2× cores locally; on a real cluster this
  is expected to be overridden (spark.sql.shuffle.partitions scales with
  executors, AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "ocr-spark",
                  master: str | None = None,
                  cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
