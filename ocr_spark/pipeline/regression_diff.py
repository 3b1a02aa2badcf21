"""Extraction regression diff: per-turn text parity between two runs.

The north rule's acceptance metric is per-turn text equality under
stable ordering — golden fixtures pin it against the reference. This is
the same metric as TOOLING: compare two extraction outputs (old kernel
vs new kernel, two snapshots, local vs cluster) and report, per payload
kind, how many turns matched byte-for-byte and where rows exist on only
one side. A kernel change that silently alters one payload kind shows up
as a per-kind equal_bp drop before any golden fixture is touched.

Shape: each side collapses to one digest row per (conv_id, turn_idx) —
ties (duplicate turn keys are legal in the synthetic corpus) fold into
one md5 over the SORTED text multiset, so the digest is order- and
partitioning-invariant — then one keyed full outer join at turn-key
grain and a tiny per-kind aggregation. Both sides stream through two
shuffles total; nothing collects.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KEYS = ["conv_id", "turn_idx"]


def _digest(df: DataFrame) -> DataFrame:
    # the digest covers (kind, text): a kernel change that reroutes a
    # payload to a different kind with IDENTICAL text must still read as
    # a divergence — that's a parser-routing regression, not parity
    return (df.groupBy(*_KEYS)
            .agg(F.min("source_kind").alias("kind"),
                 F.count("*").cast("long").alias("n"),
                 F.md5(F.concat_ws(
                     "\x00",
                     F.sort_array(F.collect_list(F.concat_ws(
                         "\x1f", "source_kind", "clean_text")))))
                 .alias("digest")))


def diff_extractions(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """Per-kind parity report between two extraction outputs (columns
    conv_id, turn_idx, source_kind, clean_text). equal = same number of
    tie rows AND the same sorted (kind, text) multiset at that turn key;
    the report buckets each key under run A's kind (run B's for
    B-only keys)."""
    a = _digest(run_a).select(
        *_KEYS, F.col("kind").alias("kind_a"), F.col("n").alias("n_a"),
        F.col("digest").alias("dig_a"))
    b = _digest(run_b).select(
        *_KEYS, F.col("kind").alias("kind_b"), F.col("n").alias("n_b"),
        F.col("digest").alias("dig_b"))
    j = a.join(b, _KEYS, "full")
    per = j.select(
        F.coalesce("kind_a", "kind_b").alias("source_kind"),
        F.col("dig_a").isNotNull().cast("long").alias("in_a"),
        F.col("dig_b").isNotNull().cast("long").alias("in_b"),
        ((F.col("dig_a") == F.col("dig_b"))
         & (F.col("n_a") == F.col("n_b"))).cast("long").alias("eq"))
    both = F.sum(F.col("in_a") * F.col("in_b")).cast("long")
    return (per.groupBy("source_kind")
            .agg(F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long")
                 .alias("n_a_only"),
                 F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long")
                 .alias("n_b_only"),
                 both.alias("n_both"),
                 F.sum(F.coalesce(F.col("eq"), F.lit(0))).cast("long")
                 .alias("n_equal"))
            .withColumn("equal_bp",
                        F.expr("n_equal * 10000"
                               " DIV greatest(n_both, 1)").cast("long"))
            .orderBy("source_kind"))
