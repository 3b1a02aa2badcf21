"""Conversation-level extraction (grouped-map, SURVEY §2.9).

The per-turn engine treats each turn independently; some analyses need
the CONVERSATION as the document — e.g. an invoice spread across turns,
or the reference's merged-file case (T23, GenericMarkdownParser.php:
116-148) where one payload holds many sub-documents. Here the grouping
axis flips: applyInPandas per conv_id assembles the turns under stable
ordering (turn_idx, ts) into one markdown document named `conv.merged.md`
(the name pattern that triggers the reference's merged-split path), then
runs the same kernels.

Scale notes: the shuffle is groupBy(conv_id) — a conversation must fit
one task, which holds by construction for transcripts (even the hot-conv
skew model's 800-turn conversations are ~1 MB of text); the per-turn
path remains the scale workhorse, this is the per-document view."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)

CONV_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", IntegerType()),
    StructField("n_payload_turns", IntegerType()),
    StructField("n_records", IntegerType()),
    StructField("calc_total", DoubleType()),
    StructField("suppliers", ArrayType(StringType())),
])


def extract_conversations(transcripts: DataFrame) -> DataFrame:
    """One row per conversation: turns assembled under stable ordering,
    extracted as a single (possibly merged) markdown document."""

    def _extract(pdf):
        import pandas as pd

        from ..kernels import parsers as KP

        pdf = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
        conv_id = pdf["conv_id"].iloc[0]
        payload_mask = pdf["tool"].isin(["markdown", "doc_parser"])
        texts = [t or "" for t in pdf.loc[payload_mask, "text"]]
        doc = "\n\n".join(texts)
        res = KP.extract_turn("md", f"{conv_id}.merged.md", doc) if doc \
            else {"invoices": []}
        invoices = res["invoices"]
        return pd.DataFrame([{
            "conv_id": conv_id,
            "n_turns": int(len(pdf)),
            "n_payload_turns": int(payload_mask.sum()),
            "n_records": len(invoices),
            "calc_total": float(sum(i["calc_total"] for i in invoices)),
            "suppliers": sorted({i["supplier_name"] for i in invoices
                                 if i.get("supplier_name")}),
        }])

    return (transcripts
            .select("conv_id", "turn_idx", "ts", "text", "tool")
            .groupBy("conv_id")
            .applyInPandas(_extract, CONV_SCHEMA))
