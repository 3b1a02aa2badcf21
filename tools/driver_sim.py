"""Simulate the round driver: run every queries() entry at sf0.01 and
hash-compare against the DuckDB oracle (columns sorted by name, floats
rounded to 6), exactly per .claude/skills/verify/SKILL.md."""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main():
    from ocr_spark.pipeline.session import build_session
    import __spark_entry__ as E

    spark = build_session(app_name="driver-sim", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    r = E.entry(spark)
    n = len(r.collect())
    print(f"entry(): {n} rows, schema {len(r.schema)} cols")
    assert n >= 0

    oracles = E.oracle_sql()
    only = set(sys.argv[1:])  # optional: query names to check (default all)
    ok = mism = 0
    t_start = time.time()
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, SF)
        cols = df.columns
        rows = [tuple(row) for row in df.collect()]
        wall = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only ({len(rows)} rows) [{wall:.1f}s]")
            ok += 1
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        owall = time.time() - t0
        status = []
        if len(rows) != len(orows):
            status.append(f"ROWS {len(rows)} vs {len(orows)}")
        if sorted(cols) != sorted(ocols):
            status.append(f"COLS {sorted(cols)} vs {sorted(ocols)}")
        if not status and canon(rows, cols) != canon(orows, ocols):
            status.append("HASH mismatch")
        if status:
            mism += 1
            print(f"  {name}: MISMATCH {'; '.join(status)} "
                  f"[{wall:.1f}s/{owall:.1f}s]")
        else:
            ok += 1
            print(f"  {name}: ok ({len(rows)} rows) "
                  f"[{wall:.1f}s/{owall:.1f}s]")
        spark.catalog.clearCache()
    print(f"SUMMARY: {ok} ok, {mism} mismatched "
          f"({time.time() - t_start:.0f}s total)")
    spark.stop()
    sys.exit(1 if mism else 0)


if __name__ == "__main__":
    main()
