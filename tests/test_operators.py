"""Operator-layer correctness: every Spark query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01). Order-insensitive:
rows are compared as sorted tuples with doubles rounded."""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available")


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchall(), [d[0] for d in con.description]


def _canon(rows, cols):
    """Column-name-sorted, value-normalized, order-insensitive row set."""
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
    return sorted(out, key=repr), [cols[i] for i in order]


def _all_queries():
    from ocr_spark.operators import ALL_QUERIES
    return ALL_QUERIES


QUERY_ITEMS = sorted(_all_queries().items())


@pytest.mark.parametrize("name", [n for n, (f, s) in QUERY_ITEMS if s])
def test_query_matches_oracle(spark, name):
    fn, sql = _all_queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    drows, dcols = _duck(sql)
    sc, scol_names = _canon(srows, scols)
    dc, dcol_names = _canon(drows, dcols)
    assert scol_names == dcol_names, f"{name}: column mismatch {scol_names} != {dcol_names}"
    assert len(sc) == len(dc), f"{name}: row count {len(sc)} != {len(dc)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row diffs; first: "
        f"{sc[mismatches[0]]} != {dc[mismatches[0]]}")


@pytest.mark.parametrize("name", [n for n, (f, s) in QUERY_ITEMS if not s])
def test_rows_only_queries_run(spark, name):
    fn, _ = _all_queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_ivf_recall_vs_bruteforce(spark):
    """IVF ANN must recover most of the brute-force top-10 (it probes
    4/16 cells, so it is approximate — recall, not equality)."""
    from ocr_spark.operators.corpus import sim_cosine_topk, sim_ivf_topk
    bf = {(r.query_id, r.cand_id) for r in sim_cosine_topk(spark, SF_DIR).collect()}
    ivf = {(r.query_id, r.cand_id) for r in sim_ivf_topk(spark, SF_DIR).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"
