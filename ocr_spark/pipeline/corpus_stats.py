"""Persisted corpus-profile snapshot — the between-crawls monitoring
artifact.

The in-registry operator (operators/quality.txt_drift_tvd) shows the
drift READ over one corpus split into md5 halves; a real pipeline
snapshots each crawl's profile once and compares the NEXT crawl against
the COMMITTED snapshot before any of it enters curation:

- build_stats: one map-only projection + one map-side-combinable
  groupBy(source, bucket) collapses the corpus to ~|sources| x 40
  profile rows (doc counts + token sums per floor-log2 length bucket),
  committed as parquet. The 100 TB corpus is read once; the artifact is
  kilobytes.
- drift_check: profile the new batch the same way (the SHARED
  len_bucket_frame expression — a snapshot built yesterday must stay
  comparable to a profile computed today) and report per-source
  total-variation distance in integer basis points plus coverage status
  (new / vanished sources). All integer arithmetic — the same portable
  math as the registry read.

Atomicity contract (uniform with ann_index.py / dedup_index.py /
classifier.py / maintenance.py): the manifest is written only after the
data commit succeeds; a rebuild invalidates the stale manifest BEFORE
overwriting; readers treat a missing manifest as "no snapshot". A
crashed build leaves orphan files, never a readable-but-partial
snapshot.
"""
from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.quality import len_bucket_frame

STATS_VERSION = 1

_MANIFEST = "_stats_manifest.json"
_DATA = "profile"


def profile_of(docs: DataFrame) -> DataFrame:
    """(source, bucket, n_docs, n_tokens) — the snapshot grain."""
    return (len_bucket_frame(docs)
            .groupBy("source", "bucket")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("n_tokens")))


def _write_manifest(stats_dir: str, manifest: dict) -> None:
    with open(os.path.join(stats_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)


_TAGS_FILE = "_applied_tags.json"


def _write_tags(data_dir: str, tags: list[str]) -> None:
    with open(os.path.join(data_dir, _TAGS_FILE), "w") as f:
        json.dump(tags, f)


def _applied_tags(data_dir: str) -> list[str]:
    """Tags recorded INSIDE the data directory — they travel with the
    swap rename, so 'which batches are in this profile' commits
    atomically with the profile itself (the manifest's copy can lag by
    one crash window; this file cannot)."""
    path = os.path.join(data_dir, _TAGS_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def build_stats(spark: SparkSession, docs: DataFrame, output_dir: str,
                batch_tag: str = "") -> dict:
    """Profile the corpus and commit the snapshot (manifest AFTER data)."""
    t0 = time.time()
    data_dir = os.path.join(output_dir, _DATA)
    os.makedirs(output_dir, exist_ok=True)
    # invalidate any PRIOR snapshot before the overwrite starts writing:
    # a crash mid-rebuild must not leave the old manifest pointing at
    # half-rewritten data
    stale = os.path.join(output_dir, _MANIFEST)
    if os.path.exists(stale):
        os.remove(stale)
    profile_of(docs).write.mode("overwrite").parquet(data_dir)
    tags = [batch_tag] if batch_tag else []
    _write_tags(data_dir, tags)
    # stats from the committed artifact itself — no second corpus scan
    row = (spark.read.parquet(data_dir)
           .agg(F.count("*").alias("cells"),
                F.countDistinct("source").alias("sources"),
                F.sum("n_docs").alias("docs"),
                F.sum("n_tokens").alias("tokens")).collect()[0])
    manifest = {
        "version": STATS_VERSION,
        "batch_tag": batch_tag,
        "batch_tags": tags,
        "n_cells": int(row.cells),
        "n_sources": int(row.sources),
        "n_docs": int(row.docs or 0),
        "n_tokens": int(row.tokens or 0),
        "built_unix": int(time.time()),
        "build_wall_ms": int((time.time() - t0) * 1000),
    }
    _write_manifest(output_dir, manifest)
    return manifest


def _recover_swap(stats_dir: str) -> None:
    """Roll back a crash INSIDE append_stats' two-rename swap window
    (data renamed to .append-old, tmp not yet promoted): restore the old
    profile so the committed manifest points at readable data again."""
    data_dir = os.path.join(stats_dir, _DATA)
    old = data_dir + ".append-old"
    if not os.path.exists(data_dir) and os.path.exists(old):
        os.rename(old, data_dir)


def read_manifest(stats_dir: str) -> dict | None:
    _recover_swap(stats_dir)
    path = os.path.join(stats_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def append_stats(spark: SparkSession, stats_dir: str,
                 new_docs: DataFrame, batch_tag: str | None = None) -> dict:
    """Fold an admitted crawl batch into the committed snapshot so the
    NEXT crawl drifts against the corpus as of now: profile the batch,
    union with the committed cells, sum per (source, bucket), and swap
    atomically (rewrite-into-tmp + two-rename — the parquet fallback for
    Iceberg MERGE INTO, same as dedup_index.append_batch). A retried
    append with the same batch_tag is a no-op.

    Idempotence is judged against the tags file INSIDE the data
    directory (written into the tmp dir BEFORE the swap promotes it),
    not the manifest: a crash between the swap and the manifest rewrite
    leaves the tag committed WITH the data, so the retry heals the
    manifest instead of double-counting every (source, bucket) cell —
    the profile counts ARE the drift baseline, so unlike the dedup
    index's benign n_members inflation, a double-count here would skew
    drift_bp for those sources permanently."""
    import shutil
    manifest = read_manifest(stats_dir)
    if manifest is None:
        raise FileNotFoundError(
            f"no committed corpus-stats snapshot at {stats_dir}")
    t0 = time.time()
    data_dir = os.path.join(stats_dir, _DATA)
    applied = _applied_tags(data_dir)
    if batch_tag is not None and batch_tag in applied:
        if batch_tag not in manifest.get("batch_tags", []):
            # swap committed, manifest write crashed: heal the manifest —
            # tags AND counts both describe the already-swapped data
            row = (spark.read.parquet(data_dir)
                   .agg(F.count("*").alias("cells"),
                        F.countDistinct("source").alias("sources"),
                        F.sum("n_docs").alias("docs"),
                        F.sum("n_tokens").alias("tokens")).collect()[0])
            manifest.update({
                "batch_tags": applied,
                "n_cells": int(row.cells),
                "n_sources": int(row.sources),
                "n_docs": int(row.docs or 0),
                "n_tokens": int(row.tokens or 0),
            })
            _write_manifest(stats_dir, manifest)
        return manifest
    merged = (spark.read.parquet(data_dir)
              .unionByName(profile_of(new_docs))
              .groupBy("source", "bucket")
              .agg(F.sum("n_docs").cast("long").alias("n_docs"),
                   F.sum("n_tokens").cast("long").alias("n_tokens")))
    tmp = data_dir + ".append-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.parquet(tmp)
    new_tags = applied + ([batch_tag] if batch_tag is not None else [])
    _write_tags(tmp, new_tags)  # tags ride the swap rename
    row = (spark.read.parquet(tmp)
           .agg(F.count("*").alias("cells"),
                F.countDistinct("source").alias("sources"),
                F.sum("n_docs").alias("docs"),
                F.sum("n_tokens").alias("tokens")).collect()[0])
    old = data_dir + ".append-old"
    shutil.rmtree(old, ignore_errors=True)
    # a crash between these two renames is rolled back by _recover_swap
    # on the next read (manifest still describes the old data)
    os.rename(data_dir, old)
    os.rename(tmp, data_dir)
    shutil.rmtree(old, ignore_errors=True)
    manifest.update({
        "n_cells": int(row.cells),
        "n_sources": int(row.sources),
        "n_docs": int(row.docs or 0),
        "n_tokens": int(row.tokens or 0),
        "built_unix": int(time.time()),
        "build_wall_ms": int((time.time() - t0) * 1000),
        "batch_tags": new_tags,
    })
    _write_manifest(stats_dir, manifest)  # manifest AFTER the swap
    return manifest


def read_profile(spark: SparkSession, stats_dir: str) -> DataFrame:
    if read_manifest(stats_dir) is None:
        raise FileNotFoundError(
            f"no committed corpus-stats snapshot at {stats_dir} "
            "(missing manifest — build_stats first)")
    return spark.read.parquet(os.path.join(stats_dir, _DATA))


def drift_check(spark: SparkSession, stats_dir: str,
                new_docs: DataFrame) -> DataFrame:
    """Per-source drift of a NEW batch against the committed snapshot:
    (source, n_old, n_new, drift_bp, status). drift_bp is the integer
    TVD over length-bucket shares (NULL when either side is empty —
    which the status column then names: 'new' sources have no snapshot
    rows, 'vanished' sources no batch rows, 'both' otherwise).

    The snapshot side is ~|sources| x 40 rows and is BROADCAST; the new
    batch collapses through the same one-groupBy profile, so checking a
    crawl costs one pass over the batch and never touches the old
    corpus."""
    old = read_profile(spark, stats_dir).select(
        "source", "bucket", F.col("n_docs").alias("o_a"))
    new = profile_of(new_docs).select(
        "source", "bucket", F.col("n_docs").alias("o_b"))
    cells = (old.join(new, ["source", "bucket"], "full_outer")
             .select("source", "bucket",
                     F.coalesce("o_a", F.lit(0)).alias("o_a"),
                     F.coalesce("o_b", F.lit(0)).alias("o_b")))
    totals = cells.groupBy("source").agg(
        F.sum("o_a").alias("n_a"), F.sum("o_b").alias("n_b"))
    diff = F.abs(F.expr("o_a * 10000 DIV n_a")
                 - F.expr("o_b * 10000 DIV n_b"))
    return (cells.join(F.broadcast(totals), "source")
            .groupBy("source")
            .agg(F.max("n_a").cast("long").alias("n_old"),
                 F.max("n_b").cast("long").alias("n_new"),
                 F.sum(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                              diff)).alias("sd"))
            .select("source", "n_old", "n_new",
                    F.expr("sd DIV 2").cast("long").alias("drift_bp"),
                    F.when(F.col("n_old") == 0, F.lit("new"))
                    .when(F.col("n_new") == 0, F.lit("vanished"))
                    .otherwise(F.lit("both")).alias("status"))
            .orderBy("source"))


def rarity_check(spark: SparkSession, stats_dir: str,
                 docs: DataFrame) -> DataFrame:
    """Per-document rarity against the committed snapshot: how much of
    the source's snapshot mass sits in this doc's length bucket
    (snapshot_share_bp; NULL when the (source, bucket) cell — or the
    whole source — is unseen). A doc landing in a near-empty cell of
    its source's historical profile is the per-row face of drift: the
    triage read for 'this crawl suddenly emits 10-token pages'.

    Works identically on a STATIC batch and on a STREAM: the profile is
    a stream-static LEFT join (the static side is ~|sources| x 40 rows,
    re-read per micro-batch, no state store), and the projection is
    stateless. Batch/stream equivalence is pinned in
    tests/test_corpus_stats.py."""
    if read_manifest(stats_dir) is None:
        raise FileNotFoundError(
            f"no committed corpus-stats snapshot at {stats_dir} "
            "(missing manifest — build_stats first)")
    prof = spark.read.parquet(os.path.join(stats_dir, _DATA))
    totals = (prof.groupBy("source")
              .agg(F.sum("n_docs").alias("src_docs")))
    cells = (prof.join(totals, "source")
             .select("source", "bucket",
                     F.expr("n_docs * 10000 DIV src_docs")
                     .cast("long").alias("snapshot_share_bp")))
    return (len_bucket_frame(docs)
            .join(F.broadcast(cells), ["source", "bucket"], "left")
            .select("doc_id", "source", "bucket", "n_tok",
                    "snapshot_share_bp"))
