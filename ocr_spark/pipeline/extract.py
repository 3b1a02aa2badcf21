"""The extraction job: transcripts → extracted_turns (+ checkpoint manifest).

Spark plan (SURVEY.md §3.1 restatement, §4 custom work):

  read transcripts
    → [optional] skew-salted repartition on (conv_id, turn_idx bucket)
    → mapInPandas extraction stage (Arrow batches; kernels from
      ocr_spark.kernels — all per-row logic lives here, nothing per-row in
      the driver)
    → one output row per input turn (lineage is 1:1 by construction)
    → write parquet partitioned by resume bucket
    → manifest rows per bucket (rows_in/out/rejected, wall_ms, version)

Scale notes:
- The extraction map is embarrassingly parallel; the repartition exists to
  split *hot conversations* (1% of convs carry 100× turns in the synthetic
  skew model) and length-skewed payload runs across tasks. It shuffles only
  (conv_id, turn_idx, text…) rows once, before the expensive Python stage,
  so the Python stage is balanced. For inputs already well-bucketed (e.g.
  an Iceberg table bucketed by conv_id), pass salt_partitions=0 to skip the
  shuffle entirely and run map-only over the scan partitions.
- resume bucket = pmod(xxhash64(conv_id), n_buckets): stable across runs
  and cluster sizes (task partition ids are not), so a restarted job can
  anti-join completed buckets from the manifest and process only the rest
  (RunStore.php:20-31 atomic-draft analog, set-oriented).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               MapType, StringType, StructField, StructType,
                               TimestampType)

from .. import EXTRACTOR_VERSION

ITEM_SCHEMA = StructType([
    StructField("code", StringType()),
    StructField("name", StringType()),
    StructField("description", StringType()),
    StructField("qty", DoubleType()),
    StructField("unit", StringType()),
    StructField("unit_price", DoubleType()),
    StructField("total", DoubleType()),
    StructField("metadata", MapType(StringType(), StringType())),
])

RECORD_SCHEMA = StructType([
    StructField("source_file", StringType()),
    StructField("format_detected", StringType()),
    StructField("supplier_name", StringType()),
    StructField("customer_name", StringType()),
    StructField("invoice_date", StringType()),
    StructField("invoice_number", StringType()),
    StructField("declared_total", DoubleType()),
    StructField("calc_total", DoubleType()),
    StructField("currency", StringType()),
    StructField("items", ArrayType(ITEM_SCHEMA)),
    StructField("metadata", MapType(StringType(), StringType())),
])

SPAN_SCHEMA = StructType([
    StructField("field", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
])

EXTRACT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("ts", TimestampType()),
    StructField("bucket", IntegerType()),
    StructField("source_kind", StringType()),
    StructField("confidence", DoubleType()),
    StructField("clean_text", StringType()),
    StructField("spans", ArrayType(SPAN_SCHEMA)),
    StructField("records", ArrayType(RECORD_SCHEMA)),
    StructField("n_items", IntegerType()),
    StructField("calc_total", DoubleType()),
    StructField("warnings", ArrayType(StringType())),
    StructField("is_document", IntegerType()),
    StructField("rejected", IntegerType()),
])

MANIFEST_SCHEMA = StructType([
    StructField("run_id", StringType()),
    StructField("source_snapshot_id", StringType()),
    StructField("bucket", IntegerType()),
    StructField("rows_in", LongType()),
    StructField("rows_out", LongType()),
    StructField("rows_rejected", LongType()),
    StructField("extractor_version", StringType()),
    StructField("wall_ms", LongType()),
    StructField("committed_at", TimestampType()),
])


def _ext_for(tool: str, text: str) -> str:
    """Payload kind per FIXTURES.md §1: tool column decides the 'file ext'."""
    if tool == "doc_parser":
        return "json"
    if tool == "markdown":
        return "md"
    if tool == "html":
        return "html"
    if tool == "pdf" or text.startswith("%PDF-"):
        return "pdf"
    return "txt"


def _coerce_record(inv: dict) -> dict:
    """Kernel dict → Arrow-friendly record (stringify metadata values)."""
    items = []
    for it in inv.get("items") or []:
        items.append({
            "code": it["code"], "name": it["name"],
            "description": it["description"],
            "qty": float(it["qty"]), "unit": it["unit"],
            "unit_price": float(it["unit_price"]),
            "total": float(it["total"]),
            "metadata": {str(k): str(v) for k, v in (it.get("metadata") or {}).items()},
        })
    return {
        "source_file": inv.get("source_file"),
        "format_detected": inv.get("format_detected"),
        "supplier_name": inv.get("supplier_name"),
        "customer_name": inv.get("customer_name"),
        "invoice_date": inv.get("invoice_date"),
        "invoice_number": inv.get("invoice_number"),
        "declared_total": (None if inv.get("declared_total") is None
                           else float(inv["declared_total"])),
        "calc_total": float(inv.get("calc_total") or 0.0),
        "currency": inv.get("currency"),
        "items": items,
        "metadata": {str(k): str(v) for k, v in (inv.get("metadata") or {}).items()},
    }


def _warnings_for(invoices: list[dict]) -> list[str]:
    """Validator-style flags (InvoiceDataValidator.php:439-508 semantics,
    warnings only — the reference flow runs with validation off, so these
    are side-band flags and never mutate the record)."""
    warns = []
    for inv in invoices:
        d, c = inv.get("declared_total"), inv.get("calc_total") or 0.0
        if d is not None and d > 0 and abs(d - c) / d > 0.05:
            warns.append("TOTAL_MISMATCH")
        for it in inv.get("items") or []:
            if it["qty"] > 1e5 or it["unit_price"] > 1e7 or it["total"] > 1e8:
                warns.append("VALUE_OUT_OF_RANGE")
            t = it["total"]
            if t > 0 and abs(it["qty"] * it["unit_price"] - t) / t > 0.05:
                warns.append("ITEM_MATH_MISMATCH")
    return warns


def make_extract_fn():
    """Iterator[pd.DataFrame] → Iterator[pd.DataFrame] extraction stage.

    Imports + regex compilation happen once per Python worker (module
    level), amortized across all Arrow batches (SURVEY §4 item 2).
    """

    def _extract(batches):
        import pandas as pd

        from ..kernels import parsers as KP

        for pdf in batches:
            n = len(pdf)
            out = {k: [] for k in (
                "source_kind", "confidence", "clean_text", "spans", "records",
                "n_items", "calc_total", "warnings", "is_document", "rejected",
                "bucket")}
            for conv_id, turn_idx, text, tool in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]):
                text = text or ""
                tool = tool or ""
                ext = _ext_for(tool, text)
                name = f"{conv_id}_{int(turn_idx)}.{ext}"
                res = KP.extract_turn(ext, name, text)
                invoices = res["invoices"]
                is_doc = 1 if tool in ("doc_parser", "markdown") or ext != "txt" or (
                    res["source_kind"] is not None) else 0
                rejected = 1 if (tool in ("doc_parser", "markdown")
                                 and not invoices) else 0
                out["source_kind"].append(res["source_kind"])
                out["confidence"].append(float(res["confidence"]))
                out["clean_text"].append(res["clean_text"])
                out["spans"].append([
                    {"field": f, "start": s, "end": e} for (f, s, e) in res["spans"]])
                out["records"].append([_coerce_record(i) for i in invoices])
                out["n_items"].append(sum(len(i["items"]) for i in invoices))
                out["calc_total"].append(
                    float(sum(i["calc_total"] for i in invoices)))
                out["warnings"].append(_warnings_for(invoices))
                out["is_document"].append(is_doc)
                out["rejected"].append(rejected)
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "role": pdf["role"],
                "ts": pdf["ts"],
                "bucket": pdf["bucket"].astype("int32"),
                "source_kind": out["source_kind"],
                "confidence": out["confidence"],
                "clean_text": out["clean_text"],
                "spans": out["spans"],
                "records": out["records"],
                "n_items": pd.Series(out["n_items"], dtype="int32"),
                "calc_total": out["calc_total"],
                "warnings": out["warnings"],
                "is_document": pd.Series(out["is_document"], dtype="int32"),
                "rejected": pd.Series(out["rejected"], dtype="int32"),
            })

    return _extract


def bucket_expr(n_buckets: int):
    """Stable resume-bucket id: first 8 hex chars of md5(conv_id) mod n.

    Computable identically in Spark SQL, DuckDB, and Python — stable across
    runs, cluster sizes, and engines (unlike task partition ids or
    xxhash64 seeds)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col("conv_id")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_buckets)).cast("int")


def stable_bucket_py(conv_id: str, n_buckets: int) -> int:
    """Python twin of bucket_expr (used by tests)."""
    import hashlib
    return int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16) % n_buckets


def suggest_salt_partitions(transcripts: DataFrame,
                            target_rows_per_task: int = 20_000,
                            sample_fraction: float | None = None) -> int:
    """Pick the salt fan-out from a cheap skew sketch (SURVEY §4 item 1):
    approx distinct convs + total rows + the hottest conv's share decide
    how many partitions the salted repartition needs so no task exceeds
    ~target_rows_per_task even if the hottest conversations collide.

    One lightweight aggregation job (optionally over a sample); returns
    a partition count >= 2x the current parallelism."""
    df = transcripts
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=7)
    sketch = df.groupBy("conv_id").count().agg(
        F.count("*").alias("n_convs"),
        F.sum("count").alias("n_rows"),
        F.max("count").alias("hottest"),
    ).first()
    n_rows = (sketch.n_rows or 0) / (sample_fraction or 1.0)
    hottest = (sketch.hottest or 0) / (sample_fraction or 1.0)
    spark = transcripts.sparkSession
    base = spark.sparkContext.defaultParallelism * 2
    by_volume = int(n_rows / max(1, target_rows_per_task)) + 1
    # the hottest conv splits into ceil(hottest / turn_bucket) cells of
    # ~turn_bucket rows; enough partitions to spread those cells
    by_heat = int(hottest / 64) + 1
    return max(base, by_volume, by_heat)


def extract_turns(transcripts: DataFrame,
                  salt_partitions: int | None = None,
                  n_buckets: int = 64,
                  turn_bucket_size: int = 64) -> DataFrame:
    """Transcripts → extracted turns DataFrame (no write).

    salt_partitions:
      None  → default: 2× cluster parallelism shuffle on the salted key
      0     → skip the repartition (map-only over scan partitions)
      n > 0 → explicit partition count
    The salt key is (conv_id, floor(turn_idx / turn_bucket_size)): turns of
    a hot conversation spread over many tasks while consecutive turns stay
    together for Arrow-batch locality.
    """
    spark = transcripts.sparkSession
    # null-key quarantine, JVM-side, BEFORE the Arrow stage: a malformed
    # row with null conv_id/turn_idx otherwise kills its whole task
    # (pandas IntCastingNaNError on the int32 columns) — at 100 TB one
    # bad row must not kill a job. Such rows land in conv_id '' at turn
    # -1, are extracted normally, and stay visible in lineage (rows in ==
    # rows out holds).
    df = (transcripts
          .select(F.coalesce(F.col("conv_id"), F.lit("")).alias("conv_id"),
                  F.coalesce(F.col("turn_idx"), F.lit(-1)).alias("turn_idx"),
                  "role", "text", "tool", "ts")
          .withColumn("bucket", bucket_expr(n_buckets)))
    if salt_partitions is None:
        salt_partitions = spark.sparkContext.defaultParallelism * 2
    if salt_partitions:
        df = df.repartition(
            salt_partitions,
            F.col("conv_id"),
            F.floor(F.col("turn_idx") / turn_bucket_size))
    return df.mapInPandas(make_extract_fn(), schema=EXTRACT_SCHEMA)


def run_extract_job(spark: SparkSession, transcripts: DataFrame,
                    output_dir: str, run_id: str,
                    source_snapshot_id: str = "",
                    resume: bool = False,
                    salt_partitions: int | None = None,
                    n_buckets: int = 64) -> dict:
    """Full job: extract → write parquet partitioned by bucket → commit
    per-bucket manifest. Returns job metrics.

    Resume: with resume=True, buckets already recorded in the manifest are
    skipped (anti-join on the stable bucket id) and new output is appended.
    The manifest is committed *after* the data write succeeds — a crashed
    run leaves at worst orphan data files for incomplete buckets, which a
    re-run overwrites (dynamic partition overwrite), never a manifest entry
    without data: same atomicity contract as the reference's tmp+rename
    draft write (RunStore.php:20-31).
    """
    t0 = time.time()
    data_dir = os.path.join(output_dir, "extracted_turns")
    manifest_dir = os.path.join(output_dir, "_checkpoints")

    done: list[int] = []
    if resume and os.path.isdir(manifest_dir):
        try:
            done = [r.bucket for r in
                    spark.read.parquet(manifest_dir).select("bucket")
                    .distinct().collect()]
        except Exception:
            done = []

    pending = transcripts
    if done:
        # prefilter on the same stable bucket expression the output is
        # partitioned by — completed buckets never reach the Python stage
        pending = transcripts.where(~bucket_expr(n_buckets).isin(done))

    extracted = extract_turns(pending, salt_partitions=salt_partitions,
                              n_buckets=n_buckets)

    # ALWAYS dynamic partition overwrite, also on resume: completed buckets
    # are filtered out of `pending` so they emit no partitions and stay
    # untouched, while buckets whose data committed but whose manifest write
    # crashed get cleanly REPLACED instead of appended-to (append would
    # duplicate every row of such an orphan bucket on resume).
    (extracted.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket")
     .parquet(data_dir))

    # manifest from the committed data (exact counts, no extra job over the
    # python stage: parquet scan + hash agg only)
    out_df = spark.read.parquet(data_dir)
    wall_ms = int((time.time() - t0) * 1000)
    manifest = (
        out_df.groupBy("bucket")
        .agg(F.count("*").alias("rows_out"),
             F.sum("rejected").cast("long").alias("rows_rejected"))
        .withColumn("rows_in", F.col("rows_out"))  # 1:1 by construction
        .withColumn("run_id", F.lit(run_id))
        .withColumn("source_snapshot_id", F.lit(source_snapshot_id))
        .withColumn("extractor_version", F.lit(EXTRACTOR_VERSION))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn("committed_at", F.current_timestamp())
        .select([f.name for f in MANIFEST_SCHEMA.fields])
    )
    if done:
        manifest = manifest.where(~F.col("bucket").isin(done))
    manifest.write.mode("append").parquet(manifest_dir)

    rows = out_df.count()
    return {
        "run_id": run_id,
        "rows_out": rows,
        "buckets_skipped": len(done),
        "wall_ms": wall_ms,
        "output": data_dir,
        "manifest": manifest_dir,
    }


def list_runs(spark: SparkSession, output_dir: str,
              limit: int = 50) -> DataFrame:
    """Run catalog (S9, RunStore.php:58-96 listRuns): newest-first summary
    of committed runs from the checkpoint manifest — run id, buckets,
    rows in/out/rejected, extractor version — limit N. Set-oriented: one
    manifest scan + hash agg instead of a glob + per-dir JSON read."""
    manifest_dir = os.path.join(output_dir, "_checkpoints")
    m = spark.read.parquet(manifest_dir)
    return (
        m.groupBy("run_id", "extractor_version")
        .agg(F.countDistinct("bucket").alias("n_buckets"),
             F.sum("rows_in").alias("rows_in"),
             F.sum("rows_out").alias("rows_out"),
             F.sum("rows_rejected").alias("rows_rejected"),
             F.max("committed_at").alias("committed_at"))
        .orderBy(F.desc("run_id"))
        .limit(limit)
    )


def stable_order(extracted: DataFrame) -> DataFrame:
    """Stable turn ordering: within conv_id order by (turn_idx, ts) — the
    invariant every equality comparison runs under (north_rule;
    FileScanner.php:91 analog). Adds turn_seq."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return extracted.withColumn("turn_seq", F.row_number().over(w))
