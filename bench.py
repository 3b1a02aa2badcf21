#!/usr/bin/env python3
"""Benchmark harness (driver contract + scaling evidence).

Default mode (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "extraction": {...}}

--scaling mode: runs the same extraction job at local[N] and local[4N]
(N=$SPARK_GRAFT_SCALE_N, default 8) over the same deterministic synthetic
transcripts and writes BENCH/BASELINE.md with throughput at both plus
scaling efficiency = (tput_4N / tput_N) / 4 (target ≥ 0.8 per north_rule —
no real cluster in this sandbox, so parallelism levels stand in for
cluster sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


HEADLINE = [
    "q1_pricing_summary", "f4_tolerance_gate", "j1_dim_lookup_join",
    "j2_product_join", "a7_topk_per_group", "w3_gap_sessionize",
    "u4_fallback_chain", "dd_exact_dup", "dd_ngram_jaccard",
    "dd_minhash_lsh", "sim_cosine_topk", "txt_quality", "txt_langid",
    "extract_documents",
]


def _run_queries(spark, sf_dir: str) -> dict[str, float]:
    from ocr_spark.operators import ALL_QUERIES
    timings = {}
    for name in HEADLINE:
        fn, _sql = ALL_QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
    return timings


def _extraction_bench(spark, n_convs: int, salt_partitions=None) -> dict:
    """Extraction throughput over the deterministic synthetic transcripts.
    Payload synthesis is excluded from the timed window (cached input)."""
    from pyspark import StorageLevel

    from ocr_spark.pipeline.extract import extract_turns
    from ocr_spark.sources.synthetic import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs=n_convs)
    t = t.persist(StorageLevel.MEMORY_AND_DISK)
    n_turns = t.count()  # materialize input before timing
    t0 = time.time()
    e = extract_turns(t, salt_partitions=salt_partitions)
    out_rows = e.count()
    wall = time.time() - t0
    t.unpersist()
    assert out_rows == n_turns
    return {
        "n_turns": n_turns,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }


def main_bench() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    from ocr_spark.pipeline.session import build_session
    spark = build_session(app_name="ocr-spark-bench", cores=cpus)
    try:
        timings = _run_queries(spark, sf_dir)
        # extraction throughput at a turn count scaled to sf
        n_convs = max(200, int(20000 * sf))
        ext = _extraction_bench(spark, n_convs=n_convs)
        total = round(sum(timings.values()) + ext["wall_sec"], 3)
        result = {
            "metric": "headline queries + extraction wall time",
            "value": total,
            "unit": "sec",
            "queries": {**timings, "extract_synthetic_bench": ext["wall_sec"]},
            "sf": sf,
            "extraction": ext,
            "cpus": cpus,
        }
        print(json.dumps(result))
    finally:
        spark.stop()


def main_scaling() -> None:
    n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    n_large = 4 * n_small
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "2500"))

    from ocr_spark.pipeline.session import build_session
    results = {}
    for cores in (n_small, n_large):
        spark = build_session(app_name=f"ocr-spark-scale-{cores}", cores=cores)
        try:
            # warm up the JVM/Python workers before the timed run
            _extraction_bench(spark, n_convs=max(100, n_convs // 10))
            results[cores] = _extraction_bench(spark, n_convs=n_convs)
            print(f"local[{cores}]: {results[cores]}", file=sys.stderr)
        finally:
            spark.stop()

    tput_s = results[n_small]["turns_per_sec"]
    tput_l = results[n_large]["turns_per_sec"]
    eff = round(tput_l / tput_s / (n_large / n_small), 3)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — measured extraction throughput + scaling efficiency

Same deterministic synthetic transcripts input ({results[n_small]['n_turns']}
turns, 1% hot convs at 100x turns) extracted at two parallelism levels on one
machine (sandbox stand-in for N and 4N executor clusters, per the driver's
instruction). Input is materialized (cached) before the timed window; timing
covers the salted repartition + mapInPandas extraction + count.

| Config | Turns | Wall (s) | Throughput (turns/s) |
|---|---|---|---|
| local[{n_small}] (N) | {results[n_small]['n_turns']} | {results[n_small]['wall_sec']} | {tput_s} |
| local[{n_large}] (4N) | {results[n_large]['n_turns']} | {results[n_large]['wall_sec']} | {tput_l} |

**Scaling efficiency N→4N = (tput_4N / tput_N) / 4 = {eff}** (target ≥ 0.8,
north_rule). Extraction is a salted map-only stage — no shuffle after the
initial repartition — so efficiency tracks CPU scaling until input
materialization or Python-worker startup dominates.
""")
    print(json.dumps({
        "metric": "scaling efficiency N->4N",
        "value": eff,
        "unit": "ratio",
        "queries": {f"local[{n_small}]": results[n_small]["wall_sec"],
                    f"local[{n_large}]": results[n_large]["wall_sec"]},
        "throughput": {f"local[{n_small}]": tput_s, f"local[{n_large}]": tput_l},
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_bench()
