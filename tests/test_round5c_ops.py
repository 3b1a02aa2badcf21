"""Round-5 continuation operators: lexical BM25 retrieval and friends.

Each new operator gets (a) an edge-corpus differential against its own
oracle SQL (the same canonicalization the driver uses), (b) a semantic
invariant test on planted documents, and (c) a plan pin where the scale
shape matters (broadcast query side — the corpus must never self-join
or shuffle at corpus grain beyond its one matched-slice groupBy).
"""

import math
import os

import duckdb
import pytest

from pyspark.sql import functions as F


# Edge corpus: empty text, single-token (no bigrams), vertical-tab +
# formfeed whitespace, a repeated-bigram doc, and two docs sharing a
# rare phrase with one of the query docs (doc_id < 3 are queries).
BM25_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 35),
    (1, "slow query fast scan slow query", "en", "s1", 31),
    (2, "", "en", "s2", 0),                       # empty query doc
    (3, "alpha beta gamma delta unrelated words here", "en", "s0", 44),
    (4, "x\x0balpha\x0bbeta\fgamma\tdelta", "en", "s1", 26),  # exotic ws
    (5, "slow query slow query slow query slow query", "en", "s2", 44),
    (6, "single", "en", "s0", 6),                 # one token, no bigrams
    (7, "beta gamma beta gamma beta gamma", "en", "s1", 32),
    (8, "totally disjoint vocabulary document", "en", "s2", 36),
]


def _bm25_dir(spark, tmp_path):
    d = str(tmp_path / "bm25")
    spark.createDataFrame(
        BM25_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


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


def _duck_on(d, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(d, 'documents.parquet')}/*.parquet'")
    res = con.execute(sql)
    return res.fetchall(), [c[0] for c in res.description]


def test_bm25_edge_corpus_matches_oracle(spark, tmp_path):
    from ocr_spark.operators.corpus import SIM_BM25_SQL, sim_bm25_topk
    d = _bm25_dir(spark, tmp_path)
    sdf = sim_bm25_topk(spark, d)
    drows, dcols = _duck_on(d, SIM_BM25_SQL)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols)


def test_bm25_semantics(spark, tmp_path):
    from ocr_spark.operators.corpus import sim_bm25_topk
    d = _bm25_dir(spark, tmp_path)
    rows = sim_bm25_topk(spark, d).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # empty query doc (2) retrieves nothing; no self-candidates anywhere
    assert 2 not in by_q
    assert all(r.cand_id != r.query_id for r in rows)
    # ranks are contiguous from 1 and ordered by (score desc, cand asc)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r.score_bp, r.cand_id) for r in rs]
        assert keys == sorted(keys)
    # docs 3 and 4 each share 3 bigrams with query 0 (doc 4's \x0b/\f
    # separators tokenize like spaces); the SHORTER doc 4 wins on BM25
    # length normalization
    assert by_q[0][0].cand_id == 4
    assert {r.cand_id for r in by_q[0]} >= {3, 4, 7}
    # the repeated-phrase doc 5 is query 1's best match
    assert by_q[1][0].cand_id == 5
    # the disjoint-vocabulary doc is never retrieved
    assert all(r.cand_id != 8 for r in rows)
    # scores are positive and tf-saturating: doc 5 (tf=4 of "slow query")
    # scores higher than doc 1's own phrase df would give a single hit
    assert all(r.score_bp > 0 for r in rows)


# Edge corpus for drift / length-bucket / soft-dedup: an exact-dup
# triple, an empty doc, a single-doc source (empty md5 half -> NULL
# drift), exotic whitespace, and a >2048-token doc (truncation arm).
R5C_DOCS = [
    (0, "copy of this text", "en", "dup_src", 17),
    (1, "copy of this text", "en", "dup_src", 17),
    (2, "copy of this text", "en", "dup_src", 17),
    (3, "a unique document with several words", "en", "solo_src", 36),
    (4, "", "en", "dup_src", 0),
    (5, "tab\tand\x0bvertical\fforms", "en", "dup_src", 22),
    (6, " ".join(f"w{i}" for i in range(3000)), "en", "dup_src", 4 * 3000),
    (7, "medium doc " * 40, "en", "dup_src", 440),
]


def _r5c_dir(spark, tmp_path):
    d = str(tmp_path / "r5c")
    spark.createDataFrame(
        R5C_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", [
    "txt_drift_tvd", "smp_length_buckets", "dd_soft_dedup",
    "dd_dup_rate_by_length", "mm_blob_dedup", "smp_soft_budget"])
def test_r5c_edge_corpus_matches_oracle(spark, tmp_path, name):
    from ocr_spark.operators import ALL_QUERIES
    fn, sql = ALL_QUERIES[name]
    d = _r5c_dir(spark, tmp_path)
    sdf = fn(spark, d)
    drows, dcols = _duck_on(d, sql)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols), f"{name} diverges on the edge corpus"


def test_soft_dedup_weights(spark, tmp_path):
    from ocr_spark.operators.corpus import dd_soft_dedup
    d = _r5c_dir(spark, tmp_path)
    rows = {r.doc_id: r for r in dd_soft_dedup(spark, d).collect()}
    # the dup triple shares one cluster: weight 3333 bp each
    assert all(rows[i].n_copies == 3 and rows[i].weight_bp == 3333
               for i in (0, 1, 2))
    # singletons keep full weight
    assert rows[3].n_copies == 1 and rows[3].weight_bp == 10000
    # cluster mass never exceeds one document's worth
    assert 3 * 3333 <= 10000


def test_dup_rate_by_length_flags_planted_bucket(spark, tmp_path):
    from ocr_spark.operators.corpus import dd_dup_rate_by_length
    d = _r5c_dir(spark, tmp_path)
    rows = {r.bucket: r for r in dd_dup_rate_by_length(spark, d).collect()}
    # the dup triple ("copy of this text", 4 tokens) lives in bucket
    # length(bin(4)) = 3 beside two singleton 4-6-token docs: 2 of the
    # bucket's 5 docs are non-canonical copies
    b = rows[3]
    assert b.n_dups == 2 and b.n_docs == 5
    assert b.dup_bp == 2 * 10000 // 5
    # every other bucket is dup-free
    assert all(r.n_dups == 0 for k, r in rows.items() if k != 3)


def test_length_buckets_invariants(spark, tmp_path):
    from ocr_spark.operators.quality import (LEN_BUCKET_MAX,
                                             smp_length_buckets)
    d = _r5c_dir(spark, tmp_path)
    rows = smp_length_buckets(spark, d).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == len(R5C_DOCS)
    for r in rows:
        assert 64 <= r.bucket_size <= LEN_BUCKET_MAX
        assert r.bucket_size & (r.bucket_size - 1) == 0  # power of two
        assert 0 <= r.n_padding == r.n_docs * r.bucket_size - r.n_tokens
        assert 0 <= r.waste_bp <= 10000
    # the 3000-token doc lands truncated in the cap bucket with 0 padding
    cap = {r.bucket_size: r for r in rows}[LEN_BUCKET_MAX]
    assert cap.n_docs == 1 and cap.n_padding == 0
    assert cap.n_tokens == LEN_BUCKET_MAX


def test_drift_tvd_bounds_and_null_half(spark, tmp_path):
    from ocr_spark.operators.quality import txt_drift_tvd
    d = _r5c_dir(spark, tmp_path)
    rows = {r.source: r for r in txt_drift_tvd(spark, d).collect()}
    assert set(rows) == {"dup_src", "solo_src"}
    for r in rows.values():
        assert r.n_a + r.n_b > 0
        if r.n_a > 0 and r.n_b > 0:
            assert 0 <= r.drift_bp <= 10000
        else:
            assert r.drift_bp is None  # empty half -> guarded NULL


FERT_DOCS = [
    (0, "plain ascii words here", "en", "s", 22),
    (1, "汉字没有空格分词", "zh", "s", 8),          # CJK: 1 ws token, 8 regex
    (2, "mixed: punct-heavy, text!", "en", "s", 25),
    (3, "", "es", "s", 0),                          # empty -> NULL ratios
    (4, "word", "zh", "s", 4),
]


def test_tok_fertility_edge_corpus_and_semantics(spark, tmp_path):
    from ocr_spark.operators.corpus import TOK_FERTILITY_SQL, tok_fertility
    d = str(tmp_path / "fert")
    spark.createDataFrame(
        FERT_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    sdf = tok_fertility(spark, d)
    drows, dcols = _duck_on(d, TOK_FERTILITY_SQL)
    assert _canon([tuple(r) for r in sdf.collect()], sdf.columns) == \
        _canon(drows, dcols)
    rows = {r.lang: r for r in sdf.collect()}
    # CJK text has no whitespace boundaries: the 8-char doc is ONE ws
    # token but 8 subword tokens -> fertility far above 10000 bp
    assert rows["zh"].ws_tokens == 2 and rows["zh"].bpe_tokens == 9
    assert rows["zh"].fertility_bp == 45000
    # punctuation splits regex tokens but not ws tokens
    en = rows["en"]
    assert en.bpe_tokens > en.ws_tokens and en.fertility_bp > 10000
    # the empty-only language guards its divisions with NULL
    assert rows["es"].fertility_bp is None
    assert rows["es"].chars_per_tok_bp is None


def test_retention_matrix_planted_cohorts(spark, tmp_path):
    """Multiple cohorts with churn (the sf testdata is one dense cohort,
    so the real triangle semantics need planting): A active weeks 0,1,3;
    B weeks 1,2; C week 0 only; D week 1 only."""
    import datetime as dt
    from ocr_spark.operators.temporal import (QR_RETENTION_SQL,
                                              qr_retention_matrix)
    d = str(tmp_path / "ev")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(week, day=0):
        return base + dt.timedelta(weeks=week, days=day)

    rows = [
        (1, at(0), 10, "view", 1.0, "{}"),
        (2, at(0, 2), 10, "click", 1.0, "{}"),   # same week twice
        (3, at(1), 10, "view", 1.0, "{}"),
        (4, at(3), 10, "view", 1.0, "{}"),
        (5, at(1), 20, "view", 1.0, "{}"),
        (6, at(2), 20, "view", 1.0, "{}"),
        (7, at(0), 30, "view", 1.0, "{}"),
        (8, at(1), 40, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(os.path.join(d, "events.parquet"))
    got = {(r.cohort_week, r.age_weeks): (r.n_users, r.retention_bp)
           for r in qr_retention_matrix(spark, d).collect()}
    # cohort 0 = {A, C} (2 users); cohort 1 = {B, D} (2 users)
    assert got[(0, 0)] == (2, 10000)
    assert got[(0, 1)] == (1, 5000)      # only A returns in week 1
    assert (0, 2) not in got             # nobody from cohort 0 in week 2
    assert got[(0, 3)] == (1, 5000)      # A returns in week 3
    assert got[(1, 0)] == (2, 10000)
    assert got[(1, 1)] == (1, 5000)      # only B returns
    # oracle agreement on the planted corpus too
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(d, 'events.parquet')}/*.parquet'")
    orc = {(r[0], r[1]): (r[2], r[3])
           for r in con.execute(QR_RETENTION_SQL).fetchall()}
    assert got == orc


def test_soft_budget_mass_conservation(spark, tmp_path):
    """Soft dedup spreads exactly one document's token mass across each
    cluster (up to per-doc floor loss): soft_tokens is bounded by the
    canonical mass and equals raw for dup-free sources."""
    from ocr_spark.operators.corpus import smp_soft_budget
    d = _r5c_dir(spark, tmp_path)
    rows = {r.source: r for r in smp_soft_budget(spark, d).collect()}
    dup = rows["dup_src"]
    solo = rows["solo_src"]
    # solo source has no duplicates: soft mass == raw mass
    assert solo.soft_tokens == solo.raw_tokens
    # the dup triple (4 tokens x 3 copies at 3333bp) floors to 1 each:
    # cluster mass 3 <= one doc's 4 raw tokens
    assert dup.soft_tokens < dup.raw_tokens


def test_blob_dedup_is_byte_exact_not_normalized(spark, tmp_path):
    """Whitespace-variant copies that TEXT dedup conflates must stay
    distinct assets under byte-exact blob dedup."""
    import os as _os
    from ocr_spark.operators.corpus import dd_exact_dup, mm_blob_dedup
    d = str(tmp_path / "blob")
    rows = [
        (0, "same words here", "en", "s", 15),
        (1, "same words here", "en", "s", 15),      # byte-identical copy
        (2, "same  words\there", "en", "s", 16),    # ws-variant
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(_os.path.join(d, "documents.parquet"))
    blob = {r.blob_hash: r.n_copies
            for r in mm_blob_dedup(spark, d).collect()}
    assert sorted(blob.values()) == [1, 2]          # ws-variant distinct
    text = {r.text_hash: r.n_copies
            for r in dd_exact_dup(spark, d).collect()}
    assert sorted(text.values()) == [3]             # text dedup conflates


def test_stickiness_planted_churn(spark, tmp_path):
    """DAU == WAU on an isolated day; a returning user widens WAU."""
    import datetime as dt
    from ocr_spark.operators.temporal import qr_stickiness
    d = str(tmp_path / "ev2")
    base = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, base, 10, "view", 1.0, "{}"),
        (2, base, 20, "view", 1.0, "{}"),
        (3, base + dt.timedelta(days=3), 10, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(os.path.join(d, "events.parquet"))
    got = {r.day: (r.dau, r.wau, r.stickiness_bp)
           for r in qr_stickiness(spark, d).collect()}
    assert got[0] == (2, 2, 10000)     # first day: window holds only it
    # day 3: 1 active, 2 distinct users in the trailing week
    assert got[3] == (1, 2, 5000)


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF arithmetic: a candidate in BOTH rankings must outscore one at
    the same ranks in only one; scores equal the integer RRF identity."""
    from ocr_spark.operators.corpus import (RRF_K, RRF_SCALE,
                                            sim_bm25_topk, sim_cosine_topk,
                                            sim_hybrid_topk)
    sf = "/root/testdata/sf0.001"
    bm = {(r.query_id, r.cand_id): r.rank
          for r in sim_bm25_topk(spark, sf).collect()}
    cos = {(r.query_id, r.cand_id): r.rank
           for r in sim_cosine_topk(spark, sf).collect()
           if r.query_id < 3}
    fused = {(r.query_id, r.cand_id): r.rrf_score
             for r in sim_hybrid_topk(spark, sf).collect()}
    assert fused, "hybrid returned no rows"
    for key, score in fused.items():
        want = 0
        if key in bm:
            want += RRF_SCALE // (RRF_K + bm[key])
        if key in cos:
            want += RRF_SCALE // (RRF_K + cos[key])
        assert score == want, key
    # overlap is data-dependent (sf0.001's embeddings share no top-10
    # candidate with the lexical ranking); sf0.01 has genuine fusion —
    # verify a both-rankings candidate exists and tops its query there
    sf01 = "/root/testdata/sf0.01"
    bm01 = {(r.query_id, r.cand_id): r.rank
            for r in sim_bm25_topk(spark, sf01).collect()}
    cos01 = {(r.query_id, r.cand_id): r.rank
             for r in sim_cosine_topk(spark, sf01).collect()
             if r.query_id < 3}
    top01 = {r.query_id: (r.cand_id, r.rrf_score)
             for r in sim_hybrid_topk(spark, sf01).collect() if r.rank == 1}
    both = set(bm01) & set(cos01)
    assert both, "sf0.01 lost all lexical/dense overlap"
    q, c = next(iter(both))
    assert top01[q][1] >= RRF_SCALE // (RRF_K + bm01[(q, c)]) \
        + RRF_SCALE // (RRF_K + cos01[(q, c)]) - 1


def test_retention_matrix_pre_anchor_events_agree(spark, tmp_path):
    """Events BEFORE the 2024-01-01 anchor produce negative day counts:
    Spark's DIV truncates toward zero while DuckDB floors, so the
    explicit pmod flooring is what keeps the engines (and cohort
    assignment) aligned on such feeds."""
    import datetime as dt
    from ocr_spark.operators.temporal import (QR_RETENTION_SQL,
                                              qr_retention_matrix)
    d = str(tmp_path / "ev")
    rows = [
        (1, dt.datetime(2023, 12, 30, 8, 0), 10, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 8, 0), 10, "view", 1.0, "{}"),
        (3, dt.datetime(2023, 12, 20, 8, 0), 20, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 10, 8, 0), 20, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(os.path.join(d, "events.parquet"))
    got = sorted(tuple(r) for r in qr_retention_matrix(spark, d).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(d, 'events.parquet')}/*.parquet'")
    orc = sorted(tuple(r) for r in con.execute(QR_RETENTION_SQL).fetchall())
    assert got == orc
    # 2023-12-30 is day -2 -> week -1 (floor), NOT week 0 (truncation)
    assert any(r[0] == -1 for r in got)


def test_bm25_plan_broadcasts_query_side(spark, tmp_path):
    """The corpus side must join the query-term set / df / stats via
    BROADCAST exchanges — at 100 TB the corpus is touched map-only plus
    one matched-slice aggregation, never a corpus-grain shuffle join."""
    from ocr_spark.operators.corpus import sim_bm25_topk
    d = _bm25_dir(spark, tmp_path)
    df = sim_bm25_topk(spark, d)
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in explained or "BroadcastNestedLoopJoin" in explained
    assert "SortMergeJoin" not in explained
