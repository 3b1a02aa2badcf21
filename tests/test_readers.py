"""Multi-format transcript readers: schema-fixed round-trips, corrupt-row
accounting, junk-path filtering, and extraction-equivalence across
formats."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.readers import read_transcripts, write_transcripts
from ocr_spark.sources.synthetic import synthesize_transcripts


@pytest.fixture(scope="module")
def sample(spark):
    return synthesize_transcripts(spark, n_convs=20).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts").cache()


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_round_trip_preserves_turns(spark, tmp_path, sample, fmt):
    path = str(tmp_path / fmt)
    write_transcripts(sample, path, fmt)
    got = read_transcripts(spark, path, fmt)
    assert got.count() == sample.count()
    key = lambda df: {(r.conv_id, r.turn_idx) for r in
                      df.select("conv_id", "turn_idx").collect()}
    assert key(got) == key(sample)


def test_extraction_identical_across_formats(spark, tmp_path, sample):
    """The engine's output must not depend on the wire format the
    transcripts arrived in (text payloads survive CSV escaping etc.)."""
    from ocr_spark.pipeline.extract import extract_turns

    def summarize(df):
        e = extract_turns(df, salt_partitions=0)
        return {(r.conv_id, r.turn_idx, r.source_kind, r.n_items,
                 None if r.calc_total is None else round(r.calc_total, 2))
                for r in e.select("conv_id", "turn_idx", "source_kind",
                                  "n_items", "calc_total").collect()}

    base = None
    for fmt in ("parquet", "json", "csv"):
        path = str(tmp_path / fmt)
        write_transcripts(sample, path, fmt)
        s = summarize(read_transcripts(spark, path, fmt))
        if base is None:
            base = s
        else:
            assert s == base, f"{fmt} round-trip changed extraction output"


def test_corrupt_rows_counted_not_thrown(spark, tmp_path):
    path = str(tmp_path / "j")
    os.makedirs(path)
    with open(os.path.join(path, "a.jsonl"), "w") as f:
        f.write('{"conv_id": "c1", "turn_idx": 1, "role": "user", '
                '"text": "hi", "tool": "", "ts": "2025-01-01T00:00:00"}\n')
        f.write("{this is not json}\n")
        f.write('{"conv_id": "c2", "turn_idx": 1, "role": "user", '
                '"text": "yo", "tool": "", "ts": "2025-01-01T00:00:01"}\n')
    all_rows = read_transcripts(spark, path, "json", drop_corrupt=False)
    good = read_transcripts(spark, path, "json", drop_corrupt=True)
    assert all_rows.count() == 3
    assert good.count() == 2  # the corrupt row is COUNTED out, not thrown
