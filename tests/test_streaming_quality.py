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


def _keyed_repetition(spark, sf_dir):
    """Independent keyed explode+groupBy construction of the repetition
    signals — the differential reference for the map-only sort-run fold
    that txt_repetition / quality_signals / curation_flags now share
    (operators/quality.with_repetition_signals). Kept in the test so the
    two algorithms keep checking each other."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id").isNotNull())
            .selectExpr("doc_id", "split(lower(text), '[ \\\\t\\\\n\\\\x0b\\\\f\\\\r]+') AS t")
            .where("size(t) >= 2"))
    uni = (docs.select("doc_id", F.explode("t").alias("g"))
           .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
           .groupBy("doc_id")
           .agg(F.max("c").alias("max_tok"), F.sum("c").alias("n_tok")))
    bg = (docs.selectExpr(
            "doc_id",
            "explode(transform(sequence(0, size(t) - 2),"
            " i -> concat(t[i], ' ', t[i + 1]))) AS g")
          .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
          .groupBy("doc_id")
          .agg(F.max("c").alias("max_bg"), F.sum("c").alias("n_bg"),
               F.sum(F.when(F.col("c") >= 2, F.col("c"))
                     .otherwise(F.lit(0))).alias("dup_bg")))

    def _bp(a, b):
        return F.floor(F.col(a).cast("double") / F.col(b) * 10000)

    return (uni.join(bg, "doc_id")
            .select("doc_id",
                    F.col("n_tok").cast("long").alias("n_tokens_b"),
                    _bp("max_tok", "n_tok").alias("top_token_bp"),
                    _bp("max_bg", "n_bg").alias("top_bigram_bp"),
                    _bp("dup_bg", "n_bg").alias("dup_bigram_bp")))


def test_signals_equal_keyed_aggregation_form(spark):
    from ocr_spark.streaming.quality import quality_signals
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {(r.doc_id, r.n_tokens_b, r.top_token_bp, r.dup_bigram_bp)
         for r in quality_signals(docs)
         .where(F.expr("size(split(lower(text), '[ \\\\t\\\\n\\\\x0b\\\\f\\\\r]+')) >= 2"))
         .select("doc_id", "n_tokens_b", "top_token_bp", "dup_bigram_bp")
         .collect()}
    b = {(r.doc_id, r.n_tokens_b, r.top_token_bp, r.dup_bigram_bp)
         for r in _keyed_repetition(spark, SF_DIR).collect()}
    assert a == b


def test_txt_repetition_equals_keyed_aggregation_form(spark):
    from ocr_spark.operators.quality import txt_repetition
    a = [tuple(r) for r in txt_repetition(spark, SF_DIR).collect()]
    b = sorted((tuple(r) for r in _keyed_repetition(spark, SF_DIR).collect()),
               key=lambda r: r[0])
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


def test_blocklist_and_chunking_stream_equal_batch(spark, tmp_path):
    """blocklist_gate_stream and chunk_windows_stream must produce the
    identical row sets on a micro-batched stream as on the batch frame —
    both are stateless map-only, so any micro-batch split is invisible.
    The blocklist is exercised with planted phrases (the corpus carries
    none)."""
    from ocr_spark.streaming.quality import (blocklist_gate_stream,
                                             chunk_windows_stream)
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    planted = batch.limit(3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" please CLICK here now")))
    docs = batch.unionByName(planted.withColumn(
        "doc_id", F.col("doc_id") + 10_000_000))
    src = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src)   # several files = several splits
    stream = spark.readStream.schema(docs.schema).parquet(src)

    for name, fn, key_cols in (
            ("blocklist", blocklist_gate_stream, ["doc_id"]),
            ("chunks", chunk_windows_stream,
             ["doc_id", "chunk_idx", "chunk_hash"])):
        out = str(tmp_path / f"out_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        q = (fn(stream).select(*key_cols)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.read.parquet(out).collect()}
        want = {tuple(r) for r in
                fn(spark.read.parquet(src)).select(*key_cols).collect()}
        assert got == want and len(got) > 0, name

    # the planted docs are the ONLY blocked ones
    blocked = {r.doc_id for r in spark.read.parquet(src).collect()} - {
        r.doc_id for r in
        blocklist_gate_stream(spark.read.parquet(src)).collect()}
    assert blocked == {r.doc_id + 10_000_000
                       for r in batch.limit(3).collect()}


def test_url_spam_gate_stream_equals_batch(spark, tmp_path):
    """url_spam_gate_stream drops the identical planted link farms on a
    micro-batched stream as on the batch frame (stateless map-only), and
    the survivors carry the same integer link share."""
    from ocr_spark.streaming.quality import url_spam_gate_stream
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    farms = batch.limit(4).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.lit("https://a.spam/x https://b.spam/y ok").alias("text"),
        "lang", "source", "n_chars")
    docs = batch.unionByName(farms.select(*batch.columns))
    src = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (url_spam_gate_stream(stream).select("doc_id", "link_char_bp")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in
            url_spam_gate_stream(spark.read.parquet(src))
            .select("doc_id", "link_char_bp").collect()}
    assert got == want and len(got) > 0
    kept_ids = {t[0] for t in got}
    assert not any(i >= 20_000_000 for i in kept_ids), \
        "every planted link farm must drop"


def test_bloom_check_stream_equals_batch(spark, tmp_path):
    """The streaming Bloom probe (stream-static join against the
    committed bits) must reproduce dd_bloom_check's per-doc n_hits
    exactly on the same planted batch, including at least one planted
    duplicate (all BLOOM_K probes hit)."""
    from ocr_spark.operators.corpus import (BLOOM_K, INCR_BATCH_RESIDUE,
                                            bloom_bits_build,
                                            dd_bloom_check,
                                            incr_batch_frame)
    from ocr_spark.streaming.quality import bloom_check_stream

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .where(F.col("doc_id").isNotNull()))
    corpus = docs.where(F.col("doc_id") % 10 != INCR_BATCH_RESIDUE)
    bits, m, _n = bloom_bits_build(corpus)
    bits = bits.cache()

    # the same deterministic "new crawl" the batch op checks
    src = str(tmp_path / "in")
    incr_batch_frame(docs).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (bloom_check_stream(stream, bits, m)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rolled = (spark.read.parquet(out).groupBy("doc_id")
              .agg(F.sum("hit").cast("long").alias("n_hits")))
    got = {r.doc_id: r.n_hits for r in rolled.collect()}
    want = {r.doc_id: r.n_hits
            for r in dd_bloom_check(spark, SF_DIR).collect()}
    assert got == want and len(got) > 0
    assert any(v == BLOOM_K for v in got.values())
    bits.unpersist()


def test_entropy_gate_stream_equals_batch(spark, tmp_path):
    """The low-entropy gate must pass the identical survivor set (and
    signals) on stream and batch, drop planted near-constant junk, and
    keep diverse text."""
    from ocr_spark.streaming.quality import entropy_gate_stream

    batch = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
             .where(F.col("doc_id").isNotNull()))
    junk = spark.createDataFrame(
        [(30_000_000, "spam " * 50 + "spam", "en", "s", 0),
         (30_000_001, " ".join(f"w{i}" for i in range(64)), "en", "s", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs = batch.select(*junk.columns).unionByName(junk)
    src = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (entropy_gate_stream(stream)
         .select("doc_id", "n_tokens", "ent_bits", "bpt_bp")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in
            entropy_gate_stream(spark.read.parquet(src))
            .select("doc_id", "n_tokens", "ent_bits", "bpt_bp").collect()}
    assert got == want and len(got) > 0
    kept = {t[0] for t in got}
    assert 30_000_000 not in kept, "near-constant junk must drop"
    assert 30_000_001 in kept, "diverse text must survive"
