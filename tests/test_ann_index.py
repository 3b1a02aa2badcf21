"""Persisted LSH ANN index (pipeline/ann_index.py):

- build commits a bucket-partitioned parquet artifact + manifest-after-
  data, and the manifest counts match the corpus
- serving from the artifact returns EXACTLY the direct operator's rows
  (sim_lsh_topk codes the corpus inline; the index must not change a
  single neighbor or cosine)
- the probe read is partition-PRUNED: the scan's PartitionFilters prove
  unprobed buckets are never opened (the reason the index exists)
- a missing manifest (crashed build) is refused
"""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.corpus import sim_lsh_topk
from ocr_spark.pipeline.ann_index import (build_lsh_index, query_lsh_index,
                                          read_manifest)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann") / "idx")
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .where(F.col("vec_id").isNotNull()
                  & F.col("embedding").isNotNull()))
    build_lsh_index(spark, emb, d)
    return d


def test_build_commits_partitioned_artifact(spark, index_dir):
    m = read_manifest(index_dir)
    n = (spark.read.parquet(f"{SF}/embeddings.parquet")
         .where(F.col("vec_id").isNotNull()
                & F.col("embedding").isNotNull()).count())
    assert m["n_vectors"] == n and m["n_planes"] == 6
    parts = [p for p in os.listdir(os.path.join(index_dir, "lsh_index"))
             if p.startswith("code=")]
    assert len(parts) > 1  # genuinely partitioned by bucket code


def test_index_query_matches_direct_operator(spark, index_dir):
    queries = (spark.read.parquet(f"{SF}/embeddings.parquet")
               .where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = [tuple(r) for r in
           query_lsh_index(spark, index_dir, queries, k=10).collect()]
    want = [tuple(r) for r in sim_lsh_topk(spark, SF).collect()]
    assert got == want and len(got) > 0


def test_index_read_is_partition_pruned(spark, index_dir):
    queries = (spark.read.parquet(f"{SF}/embeddings.parquet")
               .where(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    df = query_lsh_index(spark, index_dir, queries, k=5)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan


def test_missing_manifest_refused(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_manifest(str(tmp_path / "nope"))


def test_rebuild_invalidates_stale_manifest(spark, tmp_path):
    """Rebuilding over a committed ANN index removes the old manifest
    before rewriting buckets: a crash mid-rebuild reads as 'no index',
    never as a readable-but-partial one (the dedup_index contract)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from ocr_spark.pipeline.ann_index import (build_lsh_index,
                                              query_lsh_index,
                                              read_manifest)

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .where(F.col("vec_id").isNotNull()))
    idx = str(tmp_path / "idx")
    build_lsh_index(spark, emb, idx)
    # simulate the crash state the fix creates: manifest already removed
    os.remove(os.path.join(idx, "_index_manifest.json"))
    with pytest.raises(FileNotFoundError):
        read_manifest(idx)
    with pytest.raises(FileNotFoundError):
        query_lsh_index(spark, idx,
                        emb.limit(1).select(
                            F.col("vec_id").alias("query_id"), "embedding"))
    m = build_lsh_index(spark, emb, idx)       # completed rebuild recommits
    assert m["n_vectors"] > 0
