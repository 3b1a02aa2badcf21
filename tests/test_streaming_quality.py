"""Streaming quality gate: the map-only higher-order-function signals
must equal the keyed-aggregation txt_repetition on the same docs, the
gate must equal the batch curation 'quality' verdict, and the same code
must run unchanged as a streaming query."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available")


def test_signals_equal_keyed_aggregation_form(spark):
    from ocr_spark.operators.quality import txt_repetition
    from ocr_spark.streaming.quality import quality_signals
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {(r.doc_id, r.n_tokens_b, r.top_token_bp, r.dup_bigram_bp)
         for r in quality_signals(docs)
         .where(F.expr("size(split(lower(text), '\\\\s+')) >= 2"))
         .select("doc_id", "n_tokens_b", "top_token_bp", "dup_bigram_bp")
         .collect()}
    b = {(r.doc_id, r.n_tokens_b, r.top_token_bp, r.dup_bigram_bp)
         for r in txt_repetition(spark, SF_DIR).collect()}
    assert a == b


def test_gate_matches_batch_quality_verdict(spark):
    """Docs the streaming gate passes == docs the batch curation pipeline
    does NOT flag as 'quality' (other reasons come later in priority)."""
    from ocr_spark.pipeline.curate import curation_flags
    from ocr_spark.streaming.quality import quality_gate_stream
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    passed = {r.doc_id for r in quality_gate_stream(docs)
              .select("doc_id").collect()}
    not_quality_dropped = {
        r.doc_id for r in curation_flags(docs).collect()
        if r.drop_reason != "quality"}
    assert passed == not_quality_dropped


def test_gate_plan_is_map_only(spark):
    from ocr_spark.plans import exchange_count
    from ocr_spark.streaming.quality import quality_gate_stream
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert exchange_count(quality_gate_stream(docs)) == 0


def test_gate_runs_as_streaming_query(spark, tmp_path):
    from ocr_spark.streaming.quality import quality_gate_stream
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (quality_gate_stream(stream)
         .select("doc_id", "lang", "n_tokens_b", "top_token_bp")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    want = {r.doc_id for r in quality_gate_stream(batch)
            .select("doc_id").collect()}
    assert got == want and len(got) > 0
