"""Curation pipeline end-to-end: funnel arithmetic, manifest contract,
determinism under repartitioning, and planted-gate behavior. The funnel's
Spark-vs-DuckDB parity runs in test_operators.py (`curate_funnel` is in
the registry)."""

import json
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available")


def test_run_curation_end_to_end(spark, tmp_path):
    from ocr_spark.pipeline.curate import run_curation
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "curated_run")
    manifest = run_curation(spark, docs, out)

    assert manifest["n_input"] == docs.count()
    assert sum(manifest["funnel"].values()) == manifest["n_input"]
    assert manifest["n_kept"] == manifest["funnel"]["kept"]

    written = spark.read.parquet(os.path.join(out, "curated"))
    assert written.count() == manifest["n_kept"]
    assert set(written.columns) == {"doc_id", "lang", "text"}
    # partitioned by lang on disk
    langs = {r.lang for r in written.select("lang").distinct().collect()}
    for lang in langs:
        assert os.path.isdir(os.path.join(out, "curated", f"lang={lang}"))
    # manifest on disk equals the returned one
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk == manifest


def test_curation_deterministic_under_partitioning(spark, tmp_path):
    """The kept doc_id set must not depend on the input partition layout
    (every gate is per-row deterministic or keyed-aggregation-exact)."""
    from ocr_spark.pipeline.curate import curation_flags
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {(r.doc_id, r.drop_reason)
         for r in curation_flags(docs).collect()}
    b = {(r.doc_id, r.drop_reason)
         for r in curation_flags(docs.repartition(17)).collect()}
    assert a == b


def test_planted_gates(spark, tmp_path):
    """First-wins everywhere: a verbatim duplicate pair keeps its first
    copy, a later near-copy (half its chunks seen in an earlier doc)
    falls to the chunk gate while the earlier doc survives, a degenerate
    repeated-token doc falls to the quality gate, and a too-short doc
    falls to the token floor."""
    from ocr_spark.pipeline.curate import curation_flags
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo")
    rows = [
        (1, base + " one", "de"),
        (2, base + " one", "de"),          # exact dup of doc 1
        (3, "spam " * 40, "de"),           # maximal repetition
        (4, "too short", "de"),            # under the token floor
        (5, base + " two", "de"),          # near-copy: shares chunk 1 of 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    flags = {r.doc_id: r.drop_reason
             for r in curation_flags(docs).collect()}
    assert flags[1] is None                # de samples at rate 1.0
    assert flags[2] == "exact_dup"
    assert flags[3] == "quality"
    assert flags[4] == "quality"
    assert flags[5] == "chunk_dup"


def test_funnel_stages_present_at_sf001(spark):
    from ocr_spark.pipeline.curate import curate_funnel
    stages = {r.stage: r.n_docs for r in curate_funnel(spark, SF_DIR).collect()}
    assert "kept" in stages and stages["kept"] > 0
    # en is downsampled at rate 0.3, so sampling must reject something
    assert stages.get("sampled_out", 0) > 0
