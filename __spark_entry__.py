"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction over payloads synthesized from the
                sf0.001 documents table (full pipeline: detect → parse →
                normalize in an Arrow-batched mapInPandas stage).
queries()     — operator inventory per SURVEY.md §2 + the corpus-scale
                training-data ops (dedup / similarity / text analysis /
                multimodal plumbing) + the extraction engine itself.
oracle_sql()  — DuckDB equivalents for every SQL-expressible query
                (column names aliased identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ocr_spark.operators.extraction import extract_documents
    return extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.operators import ALL_QUERIES
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ocr_spark.operators import ALL_QUERIES
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items()
            if sql is not None}
