"""Extract assertable facts from a DataFrame's physical plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain string, captured (what df.explain() prints)."""
    jdf = df._jdf
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan. Split is
    bracket-aware: `In(mode, [MAIL,SHIP])` is one entry, not three (a
    naive comma split truncates at the first ']')."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\](?:,|$|\n)", plan):
        body = m.group(1).strip()
        depth, cur = 0, []
        for ch in body:
            if ch == "," and depth == 0:
                if "".join(cur).strip():
                    out.append("".join(cur).strip())
                cur = []
                continue
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            cur.append(ch)
        if "".join(cur).strip():
            out.append("".join(cur).strip())
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning evidence)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip())
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges and
    AQE's reused-exchange references). Formatted mode prints each node
    as '(n) Exchange' with its partitioning in an Arguments line."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans ('*(stage_id)' markers).

    AQE's AdaptiveSparkPlan wrapper hides codegen stage ids until
    execution, so the audit plans with AQE off — on a DEFENSIVE COPY
    (selectExpr('*') makes a fresh Dataset with its own QueryExecution;
    the trivial projection is pruned in planning). Planning the caller's
    DataFrame directly would cache the AQE-off physical plan on it, and
    a later collect()/audit on the same object would silently run and
    report the non-adaptive plan."""
    spark = df.sparkSession
    copy = df.selectExpr("*")
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = formatted_plan(copy, mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
