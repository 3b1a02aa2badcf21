"""Round-5 advice fixes, pinned with planted edge corpora:

1. qr_conversion_cohorts window math is integer MICROSECONDS on both
   engines — second-granularity diffs diverge (Spark truncates elapsed
   seconds, DuckDB counts boundary crossings) for sub-second gaps that
   straddle a second boundary or the window edge.
2. conv_refusal_scan reports 0 (not NULL) for conversations whose
   assistant turns are ALL NULL-text.
3. emb_label_centroids / emb_dim_variance / emb_outliers zero
   non-finite coordinates identically on both engines (Spark's
   non-ANSI CAST(nan AS BIGINT) silently yields 0; DuckDB raises).
"""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available")


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _duck_on(d, table, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"'{os.path.join(d, table + '.parquet')}/*.parquet'")
    res = con.execute(sql)
    return res.fetchall(), [c[0] for c in res.description]


# ---------------------------------------------------------------------------
# 1. cohort conversion: sub-second boundary straddles


# (event_id, ts, user_id, event_type): each user plants one divergence
# class of the old SECOND-granularity predicate
_EDGE_EVENTS = [
    # user 1: purchase 0.2s BEFORE signup, straddling a second boundary —
    # old Spark trunc(-0.2s)=0 converted, old DuckDB crossings=-1 did not
    (1, "2024-01-01 00:00:01.100000", 1, "signup"),
    (2, "2024-01-01 00:00:00.900000", 1, "purchase"),
    # user 2: purchase at EXACTLY signup + 7 days — inclusive edge,
    # converts on both engines
    (3, "2024-01-01 00:00:00.500000", 2, "signup"),
    (4, "2024-01-08 00:00:00.500000", 2, "purchase"),
    # user 3: purchase 0.2s past the window edge, straddling a boundary —
    # old Spark trunc=604800 converted, old DuckDB crossings=604801 did not
    (5, "2024-01-01 00:00:00.900000", 3, "signup"),
    (6, "2024-01-08 00:00:01.100000", 3, "purchase"),
    # user 4: ordinary in-window conversion
    (7, "2024-01-02 12:00:00.000000", 4, "signup"),
    (8, "2024-01-03 12:00:00.000000", 4, "purchase"),
    # user 5: signup only
    (9, "2024-01-02 00:00:00.250000", 5, "signup"),
]


def _events_dir(spark, tmp_path):
    d = str(tmp_path / "edge_events")
    rows = [(eid, ts, uid, et, None, None)
            for eid, ts, uid, et in _EDGE_EVENTS]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, "
              "event_type string, value double, props string")
    from pyspark.sql import functions as F
    df.select("event_id",
              F.col("ts_s").cast("timestamp_ntz").alias("ts"),
              "user_id", "event_type", "value", "props") \
        .write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_cohort_microsecond_window_matches_oracle(spark, tmp_path):
    from ocr_spark.operators.temporal import (qr_conversion_cohorts,
                                              QR_COHORT_SQL)
    d = _events_dir(spark, tmp_path)
    sdf = qr_conversion_cohorts(spark, d)
    drows, dcols = _duck_on(d, "events", QR_COHORT_SQL)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols)
    by_date = {str(r.cohort_date): r for r in sdf.collect()}
    # user 1 (purchase before signup) and user 3 (past the edge) must NOT
    # convert; user 2 (exact edge, inclusive) must
    assert by_date["2024-01-01"].n_users == 3
    assert by_date["2024-01-01"].n_converted == 1
    assert by_date["2024-01-02"].n_users == 2
    assert by_date["2024-01-02"].n_converted == 1


# ---------------------------------------------------------------------------
# 2. refusal scan: NULL-only-assistant conversations report 0, not NULL


# doc_id % 4 == 1 -> assistant; conv = doc_id % 50
_REFUSAL_DOCS = [
    # conv-000013: BOTH assistant turns NULL-text (the advice case)
    (13, None, "en", "web"),
    (213, None, "en", "web"),
    # conv-000017: len(text) % 5 == 0 -> template refusal injected
    (17, "abcde", "en", "web"),
    # conv-000021: ordinary non-refusal assistant turn (len % 5 != 0)
    (21, "a helpful, substantive reply here", "en", "web"),
]


def _docs_dir(spark, tmp_path, docs):
    d = str(tmp_path / "edge_docs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_refusal_scan_null_only_assistant_is_zero(spark, tmp_path):
    from ocr_spark.operators.extraction import (conv_refusal_scan,
                                                CONV_REFUSAL_SQL)
    d = _docs_dir(spark, tmp_path, _REFUSAL_DOCS)
    sdf = conv_refusal_scan(spark, d)
    drows, dcols = _duck_on(d, "documents", CONV_REFUSAL_SQL)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols)
    rows = {r.conv_id: r for r in sdf.collect()}
    nul = rows["conv-000013"]
    assert (nul.n_assistant, nul.n_refusals, nul.refusal_bp,
            nul.has_refusal) == (2, 0, 0, 0)
    assert rows["conv-000017"].has_refusal == 1
    assert rows["conv-000021"].has_refusal == 0


# ---------------------------------------------------------------------------
# 3. emb stats: non-finite coordinates quantize to 0 on both engines


_EDGE_VECS = [
    (1, [0.5, float("nan"), 1.25, 2.0], 0),
    (2, [float("inf"), 0.25, -0.75, float("-inf")], 0),
    (3, [0.5, 0.5, 1.25, 2.0], 0),
    (4, [-1.0, 0.0, 3.5, 0.125], 1),
    (5, [2.0, -2.0, 0.5, 0.5], 1),
    (6, [0.25, 0.25, 0.25, 0.25], 1),
    (7, [1.0, 1.0, 1.0, 1.0], None),   # label-free: centroids skip it
]


def _emb_dir(spark, tmp_path):
    d = str(tmp_path / "edge_emb")
    spark.createDataFrame(
        _EDGE_VECS, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", [
    "emb_label_centroids", "emb_dim_variance", "emb_outliers"])
def test_emb_stats_nonfinite_coords_match_oracle(spark, tmp_path, name):
    """A NaN/Inf coordinate must not make the oracle raise where Spark
    silently casts to 0 — both engines quantize non-finite to 0."""
    from ocr_spark.operators import ALL_QUERIES
    fn, sql = ALL_QUERIES[name]
    d = _emb_dir(spark, tmp_path)
    sdf = fn(spark, d)
    drows, dcols = _duck_on(d, "embeddings", sql)  # must not raise
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols), f"{name} diverges on non-finite coords"


# ---------------------------------------------------------------------------
# 4. the \s one-sweep: vertical-tab (\x0b) docs keep every whitespace-
#    tokenizing oracle pair hash-green. Java's \s includes \x0b, RE2's
#    does not; both engines now spell the explicit class
#    [ \t\n\x0b\f\r] so a \v-bearing doc tokenizes identically.
#    \xa0 (NBSP) must NOT split on either engine (neither Java \s nor
#    the class matches it — a unicode-\s "fix" would regress this).


_VTAB_DOCS = [
    # identical token streams under the class, different whitespace flavor
    # (vertical tabs vs spaces) -> an exact-dup/jaccard-1.0 pair iff both
    # engines treat \x0b as whitespace
    (1, "alpha\x0bbeta\x0bgamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon", "en", "web"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon", "en", "web"),
    # \x0b at the edges (leading/trailing empty fields are KEPT by
    # Spark's split and the oracle's string_split_regex)
    (3, "\x0bthe quick brown fox jumps over the lazy dog again and "
        "again until done\x0b", "en", "web"),
    # mixed ASCII whitespace runs incl. \f and \r
    (4, "one\ttwo\nthree\ffour\rfive\x0bsix seven eight nine ten "
        "eleven twelve", "en", "books"),
    # NBSP is NOT whitespace to either engine: 'a\xa0b' is ONE token
    (5, "a\xa0b stays joined while c d e f g h i j k l m n o p",
     "en", "books"),
    # repetition bait: the same \x0b-separated bigram looping
    (6, "spam\x0bham " * 15 + "spam\x0bham", "en", "crawl"),
    (7, "", "en", "crawl"),
    (8, None, "en", "crawl"),
]

# whitespace-tokenizing oracle pairs that read ONLY the documents table
_VTAB_QUERIES = [
    "txt_token_count", "txt_vocab_topk", "txt_repetition",
    "txt_gopher_gate", "txt_lm_unigram_score", "txt_lm_bigram_score",
    "txt_ttr", "txt_quality", "txt_sentence_stats", "txt_char_class_mix",
    "txt_fingerprint", "dd_exact_dup", "dd_prefix_dup",
    "dd_ngram_jaccard", "dd_chunk_dup", "txt_bpe_pair_counts",
    "dd_substring_dup", "smp_token_budget", "txt_quality_hist",
]


@pytest.mark.parametrize("name", _VTAB_QUERIES)
def test_vertical_tab_corpus_matches_oracle(spark, tmp_path, name):
    from ocr_spark.operators import ALL_QUERIES
    fn, sql = ALL_QUERIES[name]
    d = _docs_dir(spark, tmp_path, _VTAB_DOCS)
    sdf = fn(spark, d)
    drows, dcols = _duck_on(d, "documents", sql)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols), f"{name} diverges on the \\x0b corpus"


def test_vertical_tab_is_whitespace_nbsp_is_not(spark, tmp_path):
    """Semantic spot-checks on the planted corpus: the \\x0b-flavored and
    space-flavored twins hash equal, and NBSP keeps its token joined."""
    from ocr_spark.operators.corpus import dd_exact_dup, txt_token_count
    d = _docs_dir(spark, tmp_path, _VTAB_DOCS)
    dups = {r.text_hash: r for r in dd_exact_dup(spark, d).collect()}
    assert any(r.n_copies == 2 and r.keep_id == 1
               for r in dups.values()), \
        "docs 1 and 2 must collapse to one exact-dup group"
    toks = {r.doc_id: r.ws_tokens for r in
            txt_token_count(spark, d).collect()}
    assert toks[1] == toks[2] == 20
    assert toks[5] == 18          # 'a\xa0b' is ONE token (19 if split)


def test_emb_centroid_nonfinite_is_zeroed(spark, tmp_path):
    from ocr_spark.operators.corpus import emb_label_centroids
    d = _emb_dir(spark, tmp_path)
    rows = {(r.label, r.dim_idx): r
            for r in emb_label_centroids(spark, d).collect()}
    # label 0, dim 1: coords are (nan->0, 0.25, 0.5) quantized micro-units
    assert rows[(0, 1)].sum_q == 0 + 250000 + 500000
    # label 0, dim 0: (0.5, inf->0, 0.5)
    assert rows[(0, 0)].sum_q == 500000 + 0 + 500000


def test_chat_render_all_null_conv_matches_oracle(spark, tmp_path):
    """A conversation whose EVERY turn has NULL text renders as '' on
    both engines (Spark concat_ws skips NULL elements; the oracle
    COALESCEs string_agg's NULL): md5(''), 0 chars, 1 token (the
    empty-split convention) — and mixed conversations where only SOME
    turns are NULL drop exactly those turns' chrome on both engines."""
    import os

    import duckdb

    from ocr_spark.operators.extraction import (CONV_CHAT_RENDER_SQL,
                                                conv_chat_render)
    rows = [
        (3, None),                       # conv 3: single NULL turn
        (7, "alpha bravo charlie"),      # conv 7: one real turn
        (32, None),                      # conv 7 (32%25): NULL turn too
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))

    got = sorted(tuple(r) for r in conv_chat_render(spark, d).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(d, 'documents.parquet')}/*.parquet'")
    want = sorted(tuple(r) for r in
                  con.execute(CONV_CHAT_RENDER_SQL).fetchall())
    assert got == want
    by_conv = {r[0]: r for r in got}
    # the all-NULL conversation: '' on both engines
    assert by_conv["conv-000003"][2] == "d41d8cd98f00b204e9800998ecf8427e"
    assert by_conv["conv-000003"][3] == 0
    # the mixed conversation keeps only its real turn's chrome
    assert by_conv["conv-000007"][1] == 2      # both turns counted
    assert by_conv["conv-000007"][3] > 0
