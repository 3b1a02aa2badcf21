"""Stateful streaming operators: cross-micro-batch first-wins dedup and
running totals via applyInPandasWithState."""

import os

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, dedup_key string") \
        .coalesce(1).write.mode("append").parquet(path)


def _run_available_now(spark, stream_df, out, ckpt):
    """Parquet sink: the memory sink cannot recover from a checkpoint, so
    cross-micro-batch state tests need a durable sink."""
    q = (stream_df.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_dedup_survives_micro_batches(spark, tmp_path):
    from ocr_spark.streaming.stateful import streaming_dedup_first_wins
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")

    _write_batch(spark, inp, [("c1", 1, "k1"), ("c1", 2, "k2"),
                              ("c1", 3, "k1"),  # dup within batch
                              ("c2", 1, "k1")])  # same key, other conv
    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    res = _run_available_now(spark, streaming_dedup_first_wins(stream),
                             str(tmp_path / "out"), ckpt)
    got = {(r.conv_id, r.turn_idx): r.first_seen for r in res.collect()}
    assert got[("c1", 1)] == 1
    assert got[("c1", 3)] == 0, "within-batch duplicate must be tagged"
    assert got[("c2", 1)] == 1, "state is per conversation"

    # second micro-batch: duplicate of k2 arrives LATER — state remembers
    _write_batch(spark, inp, [("c1", 4, "k2"), ("c1", 5, "k3")])
    stream = spark.readStream.schema(schema).parquet(inp)
    res2 = _run_available_now(spark, streaming_dedup_first_wins(stream),
                              str(tmp_path / "out"), ckpt)
    # the parquet sink accumulates; keep only pass-2 rows (turn_idx >= 4)
    got2 = {(r.conv_id, r.turn_idx): r.first_seen for r in res2.collect()}
    assert got2[("c1", 4)] == 0, "cross-micro-batch duplicate must be tagged"
    assert got2[("c1", 5)] == 1


def test_running_totals_accumulate(spark, tmp_path):
    from ocr_spark.streaming.stateful import streaming_running_totals
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")

    def write(rows):
        spark.createDataFrame(
            rows, "conv_id string, n_items int, calc_total double") \
            .coalesce(1).write.mode("append").parquet(inp)

    write([("c1", 2, 10.50), ("c1", 1, 5.25), ("c2", 3, 1.00)])
    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    res = _run_available_now(spark, streaming_running_totals(stream),
                             str(tmp_path / "out"), ckpt)
    t1 = {r.conv_id: (r.n_turns, r.n_items, r.calc_total_cents)
          for r in res.collect()}
    assert t1["c1"] == (2, 3, 1575)
    assert t1["c2"] == (1, 3, 100)

    write([("c1", 1, 4.25)])
    stream = spark.readStream.schema(schema).parquet(inp)
    res2 = _run_available_now(spark, streaming_running_totals(stream),
                              str(tmp_path / "out"), ckpt)
    # latest emitted row per conversation wins (sink accumulates)
    t2 = {}
    for r in res2.collect():
        cur = t2.get(r.conv_id)
        if cur is None or r.n_turns > cur[0]:
            t2[r.conv_id] = (r.n_turns, r.n_items, r.calc_total_cents)
    assert t2["c1"] == (3, 4, 2000), "totals accumulate across micro-batches"


def test_streaming_neardup_across_micro_batches(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch must still link
    to the canonical document from the earlier batch — the state the
    batch self-join cannot carry."""
    from ocr_spark.streaming.stateful import streaming_minhash_neardup
    inp = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(inp)

    # batch 1: the canonical doc + one unrelated doc
    write([(1, base),
           (50, " ".join(f"unrelated{j}" for j in range(20)))])
    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    res1 = _run_available_now(spark, streaming_minhash_neardup(stream),
                              out, ckpt)
    got1 = {(r.doc_id, r.band): (r.canonical_id, r.is_first)
            for r in res1.collect()}
    assert all(v == (1, 1) for (d, _), v in got1.items() if d == 1)

    # batch 2: an exact copy of doc 1 (same signature, all bands collide)
    write([(2, base)])
    stream = spark.readStream.schema(schema).parquet(inp)
    res2 = _run_available_now(spark, streaming_minhash_neardup(stream),
                              out, ckpt)
    dup_rows = [r for r in res2.collect() if r.doc_id == 2]
    assert len(dup_rows) == 4  # one per band
    assert all(r.canonical_id == 1 and r.is_first == 0 for r in dup_rows), \
        "cross-batch duplicate must link to the batch-1 canonical"
