"""Streaming corpus quality gate.

The doc-local half of the curation pipeline (token floor + Gopher
repetition caps) re-expressed as PURE column expressions over the token
array — no explode, no groupBy, no state — so the exact same gate runs
unchanged on a streaming DataFrame: a corpus can be quality-filtered
while it lands, with the cross-doc gates (dedup, decontamination,
sampling) left to the batch curation pass or the stateful MinHash
near-dedup operator (streaming/stateful.py).

The repetition signals here are the higher-order-function twin of
operators/quality.txt_repetition's explode+groupBy: O(distinct × n) per
doc instead of a keyed shuffle. For transcript-sized docs that constant
is tiny and the plan is map-only (the right trade on a stream and a
legitimate zero-shuffle alternative in batch); for book-sized docs the
keyed-aggregation form wins. Equivalence between the two forms is
pinned by tests/test_streaming_quality.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.curate import (MAX_DUP_BIGRAM_BP, MAX_TOP_TOKEN_BP,
                               MIN_TOKENS)


def quality_signals(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens_b, top_token_bp, dup_bigram_bp as map-only
    expressions (same outputs as the keyed-aggregation txt_repetition
    for docs with ≥2 tokens)."""
    return (docs
            .selectExpr("*", "split(lower(text), '\\\\s+') AS _t")
            .selectExpr(
                "*",
                "transform(sequence(0, size(_t) - 2),"
                " i -> concat(_t[i], ' ', _t[i + 1])) AS _bg")
            .selectExpr(
                "*",
                "CAST(size(_t) AS BIGINT) AS n_tokens_b",
                # max token multiplicity over distinct tokens, O(d*n)
                "FLOOR(CAST(array_max(transform(array_distinct(_t),"
                " x -> size(filter(_t, y -> y = x)))) AS DOUBLE)"
                " / size(_t) * 10000) AS top_token_bp",
                # bigram instances whose bigram repeats within the doc
                "FLOOR(CAST(size(filter(_bg,"
                " b -> size(filter(_bg, c -> c = b)) >= 2)) AS DOUBLE)"
                " / size(_bg) * 10000) AS dup_bigram_bp")
            .drop("_t", "_bg"))


def quality_gate_stream(docs: DataFrame) -> DataFrame:
    """Filter a (streaming or batch) documents DataFrame to the rows that
    pass the doc-local curation gates, annotating the signals. Stateless
    map-only plan — valid under any streaming trigger, no watermark
    needed."""
    sig = quality_signals(docs)
    return sig.where(
        (F.col("n_tokens_b") >= MIN_TOKENS)
        & (F.col("n_tokens_b") >= 2)
        & (F.col("top_token_bp") <= MAX_TOP_TOKEN_BP)
        & (F.col("dup_bigram_bp") <= MAX_DUP_BIGRAM_BP))
