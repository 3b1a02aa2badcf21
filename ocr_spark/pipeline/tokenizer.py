"""Persisted BPE tokenizer artifact: train merges once, tokenize forever.

The registry query (operators/corpus.bpe_train_merges) IS the training
loop; this module is the artifact around it — the shape every
pretraining pipeline runs: train the tokenizer on a corpus (sample),
commit the ordered merge table, then tokenize the full corpus with a
map-only Arrow stage that applies the merges greedily per word. The
apply pass is the 100 TB side: zero shuffles, one pass, per-batch word
memoization (corpus word frequency follows Zipf — most words in a batch
repeat, so each distinct word is segmented once per batch).

Application rule = training rule: merges apply in LEARNED RANK order,
each rewriting left-to-right — byte-identical to the trainer's
per-iteration vocab rewrite (shared provenance pinned by
tests/test_tokenizer.py's reference segmentation).

Atomicity contract (same as ann_index.py / dedup_index.py): manifest
JSON written only after the merge parquet commits; a missing manifest
reads as "no tokenizer".
"""
from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.corpus import _spread, train_bpe_merge_list

TOKENIZER_VERSION = 1

_MANIFEST = "_tokenizer_manifest.json"
_DATA = "merges"


def train_tokenizer(spark: SparkSession, docs: DataFrame, output_dir: str,
                    n_merges: int) -> dict:
    """Train n_merges BPE rules on the documents frame and commit the
    ordered merge table + manifest."""
    t0 = time.time()
    data_dir = os.path.join(output_dir, _DATA)
    # invalidate any PRIOR tokenizer before rewriting its data: a crash
    # mid-retrain must not leave the old manifest pointing at a partial
    # merge table (readable-but-partial is the banned state)
    stale = os.path.join(output_dir, _MANIFEST)
    if os.path.exists(stale):
        os.remove(stale)
    merges = train_bpe_merge_list(docs, n_merges)
    (spark.createDataFrame(
        merges, "merge_rank INT, left STRING, right STRING, pair_count BIGINT")
     .coalesce(1).write.mode("overwrite").parquet(data_dir))
    manifest = {
        "version": TOKENIZER_VERSION,
        "n_merges": len(merges),
        "built_unix": int(time.time()),
        "build_wall_ms": int((time.time() - t0) * 1000),
    }
    # manifest AFTER data: a crashed train is invisible to readers
    with open(os.path.join(output_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def read_manifest(tok_dir: str) -> dict:
    path = os.path.join(tok_dir, _MANIFEST)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no committed tokenizer at {tok_dir} (missing {_MANIFEST})")
    with open(path) as f:
        m = json.load(f)
    if m.get("version") != TOKENIZER_VERSION:
        raise ValueError(f"incompatible tokenizer manifest: {m}")
    return m


def load_merges(spark: SparkSession, tok_dir: str) -> list[tuple[str, str]]:
    """The ordered (left, right) merge list of a committed tokenizer."""
    read_manifest(tok_dir)
    rows = (spark.read.parquet(os.path.join(tok_dir, _DATA))
            .orderBy("merge_rank").collect())
    return [(r.left, r.right) for r in rows]


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy BPE application: chars, then each merge in rank order
    rewriting left-to-right — the trainer's exact rewrite rule."""
    s = list(word)
    for left, right in merges:
        i, acc = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                acc.append(left + right)
                i += 2
            else:
                acc.append(s[i])
                i += 1
        s = acc
        if len(s) == 1:
            break
    return s


def apply_tokenizer(spark: SparkSession, tok_dir: str,
                    docs: DataFrame,
                    passthrough: tuple[str, ...] = (),
                    sort: bool = True) -> DataFrame:
    """Tokenize every document with the committed merges: one map-only
    Arrow stage (merges ride to executors in the closure — a few KB),
    emitting per-doc whitespace-word and BPE-token counts. The counts
    feed token budgeting / packing at the REAL tokenizer's granularity
    instead of the whitespace proxy.

    passthrough: extra STRING columns (e.g. the (lang, source) shard
    keys) carried through the Arrow stage, so a downstream consumer
    never pays a doc_id self-join back to the corpus. sort=False skips
    the display-contract orderBy for consumers that immediately
    reshuffle (the pack path — its prefix-sum windows destroy any input
    order, so the global sort would be a pure wasted exchange)."""
    merges = load_merges(spark, tok_dir)
    pt = tuple(passthrough)

    def _apply(batches):
        import re

        import pandas as pd

        # the trainer's vocab words come from Spark split on Java \s+
        # (ASCII-only); Python str.split is unicode — spell the class out
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            # per-BATCH memo (Zipf makes most words repeat within a
            # batch); a partition-lifetime dict would grow unbounded on
            # high-entropy text and OOM the Python worker
            cache: dict[str, int] = {}
            ids, n_words, n_tokens = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in ws.split((text or "").lower()) if w]
                total = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(segment_word(w, merges))
                        cache[w] = n
                    total += n
                ids.append(int(doc_id))
                n_words.append(len(words))
                n_tokens.append(total)
            if not ids:
                continue
            out = {"doc_id": ids}
            for c in pt:
                out[c] = list(pdf[c])
            out["n_words"] = n_words
            out["n_bpe_tokens"] = n_tokens
            yield pd.DataFrame(out)

    schema = ("doc_id long, "
              + "".join(f"{c} string, " for c in pt)
              + "n_words long, n_bpe_tokens long")
    out = (_spread(docs.select("doc_id", "text", *pt))
           .mapInPandas(_apply, schema))
    return out.orderBy("doc_id") if sort else out


def pack_with_tokenizer(spark: SparkSession, tok_dir: str,
                        docs: DataFrame) -> DataFrame:
    """Sequence-packing placement at the COMMITTED tokenizer's
    granularity — the two persisted artifacts composed the way a
    pretraining pipeline actually runs them: one map-only Arrow stage
    counts each document's BPE tokens (shard keys ride through, no
    corpus self-join), then the distributed two-level prefix-sum scan
    places every document in its (lang, source) shard's fixed-length
    sequence stream. Same output contract as smp_pack_sequences, with
    n_tokens_b now meaning BPE tokens."""
    from ..operators.quality import pack_placement_from
    counted = apply_tokenizer(spark, tok_dir, docs,
                              passthrough=("lang", "source"), sort=False)
    return pack_placement_from(counted, token_col="n_bpe_tokens")
