"""Relational operator layer — SURVEY.md §2 shapes over the testdata tables.

Every operator the reference engine exhibits (scans, filters, joins,
aggregations, windows/top-k, set ops, scalar kernels) re-expressed as a
declarative DataFrame plan so Catalyst handles pushdown/pruning/reordering,
paired with the DuckDB oracle SQL the driver compares against.

Scale notes per query are in the docstrings; the common rules:
- dimension joins are broadcast() explicitly (customer/nation-sized dims);
- aggregations are expressed as groupBy().agg() so partial (map-side)
  aggregation comes free;
- every window is keyed by the natural partition key so the shuffle it
  costs is the minimum one;
- doubles in output are rounded to fixed decimals (hash-stable across
  engines' summation orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A1/A2/A3-style aggregation — flagship relational query (pricing summary)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """A1 calc_total / A2 total_qty analog (SURVEY §2.4): hash agg with
    map-side partials; filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)       AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)  AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)       AS avg_qty,
       COUNT(*)                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# S1/F1/F2/W1 — scan + predicate filters + stable ordering
# ---------------------------------------------------------------------------

def s1_scan_filter_sort(spark, sf_dir):
    """Recursive-scan analog: extension whitelist → isin, junk-pattern
    filter → ~rlike, lexicographic stable order (FileScanner.php:45-94)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.where(F.col("p_size").isin(1, 5, 10, 23, 45))
        .where(~F.col("p_type").rlike("^ECONOMY"))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_name", "p_partkey")
        .limit(200)
    )


S1_SQL = """
SELECT p_partkey, p_name, p_type, p_size
FROM part
WHERE p_size IN (1, 5, 10, 23, 45) AND NOT regexp_matches(p_type, '^ECONOMY')
ORDER BY p_name, p_partkey
LIMIT 200
"""


# ---------------------------------------------------------------------------
# F4 — tolerance predicate gate (abs 0.05 OR rel 2%) with rejects side-count
# ---------------------------------------------------------------------------

def f4_tolerance_gate(spark, sf_dir):
    """PurchaseImporter.php:58-70 tolerance gate re-expressed set-oriented:
    declared (o_totalprice) vs calc (sum of line gross) per order; one
    aggregation, rejects counted in the same pass (F3-style side output
    becomes a count_if). Money runs as exact integer cents end-to-end
    (floor(x*100+0.5) per line, bigint sums) so the gate is
    summation-order independent — a ROUND over a double sum flips at
    edges under parallel partial aggregation (CLAUDE.md invariant)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    line_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                         * (1 + F.col("l_tax")) * 100 + 0.5).cast("long")
    calc = (
        li.groupBy("l_orderkey")
        .agg(F.sum(line_cents).alias("calc_cents"))
    )
    joined = orders.withColumn(
        "declared_cents",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"),
    ).join(calc, orders.o_orderkey == calc.l_orderkey, "inner")
    diff = F.abs(F.col("declared_cents") - F.col("calc_cents"))
    passed = (diff <= 5) | (diff <= 0.02 * F.abs(F.col("declared_cents")))
    return (
        joined.withColumn("passed", passed.cast("long"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.sum("passed").alias("n_passed"),
             (F.count("*") - F.sum("passed")).alias("n_rejected"))
        .orderBy("o_orderstatus")
    )


F4_SQL = """
WITH calc AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                        + 0.5) AS BIGINT)) AS calc_cents
  FROM lineitem GROUP BY l_orderkey
),
gated AS (
  SELECT o_orderstatus,
         CASE WHEN ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) - calc_cents) <= 5
                OR ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) - calc_cents)
                   <= 0.02 * ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              THEN 1 ELSE 0 END AS passed
  FROM orders JOIN calc ON o_orderkey = l_orderkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(passed) AS BIGINT) AS n_passed,
       COUNT(*) - CAST(SUM(passed) AS BIGINT) AS n_rejected
FROM gated
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# J1 — lookup join against a small dimension (broadcast)
# ---------------------------------------------------------------------------

def j1_dim_lookup_join(spark, sf_dir):
    """Get-or-create supplier lookup (PurchaseImporter.php:128-147) as a
    broadcast equi-join: the dim is small → no shuffle of the fact side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("c_mktsegment")
    )


J1_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# J2 — fact-to-dim product join (lineitem × part)
# ---------------------------------------------------------------------------

def j2_product_join(spark, sf_dir):
    """Get-or-create product on code (PurchaseImporter.php:149-166): equi
    join keyed on the product key, aggregated per brand."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("net_revenue"))
        .orderBy("p_brand")
    )


J2_SQL = """
SELECT p_brand, COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# J3 — existence probe (left semi join)
# ---------------------------------------------------------------------------

def j3_semi_join(spark, sf_dir):
    """check_entity/check_product AJAX probes (preview.php:44-98) as a
    left-semi join — no fanout, dim side broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(1000)
    )


J3_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey LIMIT 1000
"""


# ---------------------------------------------------------------------------
# J4 — file-group pairing by derived base key
# ---------------------------------------------------------------------------

def j4_base_key_pairing(spark, sf_dir):
    """groupFilesByBaseName (AbstractParser.php:21-39): strip a suffix regex
    to a base key, group, count members — same shape on part names."""
    part = _t(spark, sf_dir, "part")
    return (
        part.withColumn("base_key", F.regexp_extract(F.col("p_name"), r"^(\w+)", 1))
        .groupBy("base_key")
        .agg(F.count("*").alias("n_members"),
             F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
        .orderBy("base_key")
    )


J4_SQL = """
SELECT regexp_extract(p_name, '^(\\w+)', 1) AS base_key,
       COUNT(*) AS n_members, ROUND(AVG(p_retailprice), 2) AS avg_price
FROM part GROUP BY 1 ORDER BY base_key
"""


# ---------------------------------------------------------------------------
# A5/A6 — mean score per group + deterministic argmax
# ---------------------------------------------------------------------------

def a5_confidence_mean(spark, sf_dir):
    """Parser-confidence mean (DocParserJsonParser.php:75 analog)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"),
             F.count("*").alias("n"))
        .orderBy("event_type")
    )


A5_SQL = """
SELECT event_type, ROUND(AVG(value), 4) AS avg_value, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def a6_argmax_customer(spark, sf_dir):
    """Argmax-parser analog (ParserRegistry.php:115-148): highest-balance
    customer per nation, deterministic tie-break on the key — window
    row_number, one shuffle on the partition key."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    best = (cust.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
    return (
        best.join(broadcast(nation), best.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey",
                F.round("c_acctbal", 2).alias("best_acctbal"))
        .orderBy("n_name")
    )


A6_SQL = """
SELECT n_name, c_custkey, ROUND(c_acctbal, 2) AS best_acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) c JOIN nation ON c_nationkey = n_nationkey
WHERE rn = 1
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# A7/W6 — best-k per group (row_number window)
# ---------------------------------------------------------------------------

def a7_topk_per_group(spark, sf_dir):
    """Best-table argmax per document (TableExtraction.php:292-308) shape:
    top-3 orders per priority by totalprice, deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_priority", F.row_number().over(w))
        .where(F.col("rank_in_priority") <= 3)
        .select("o_orderpriority", "rank_in_priority", "o_orderkey",
                F.round("o_totalprice", 2).alias("total_price"))
        .orderBy("o_orderpriority", "rank_in_priority")
    )


A7_SQL = """
SELECT o_orderpriority, rank_in_priority, o_orderkey, total_price
FROM (
  SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS total_price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority
  FROM orders
) WHERE rank_in_priority <= 3
ORDER BY o_orderpriority, rank_in_priority
"""


# ---------------------------------------------------------------------------
# W2 — newest-first top-N (run listing)
# ---------------------------------------------------------------------------

def w2_top_n(spark, sf_dir):
    """RunStore::listRuns newest-first limit 50 (RunStore.php:58-96):
    Catalyst turns sort+limit into a TakeOrderedAndProject (no full sort)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
                      F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.desc("order_date"), F.desc("o_orderkey"))
        .limit(50)
    )


W2_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(o_totalprice, 2) AS total_price
FROM orders
ORDER BY order_date DESC, o_orderkey DESC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# W3 — gap-based sessionization (the bbox-Y grouping analog)
# ---------------------------------------------------------------------------

def w3_gap_sessionize(spark, sf_dir):
    """TextBlockParser.php:219-263 Y-gap grouping ≙ session windows by gap:
    lag + cumulative sum of boundary flags, one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond gap arithmetic: testdata ts is timestamp_ntz[us]; whole-
    # second truncation (unix_timestamp) would diverge from the oracle the
    # moment two events straddle the gap by <1s. timestamp_diff stays in
    # wall-clock (tz-free) arithmetic on the ntz values — an instant cast
    # (unix_micros(ts.cast("timestamp"))) would shift by the session-tz
    # DST offset when two events straddle a transition, while the oracle's
    # epoch_us is tz-free.
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    with_session = (
        ev.withColumn("new_session",
                      F.when(gap_us >= 300_000_000, 1)
                      .when(gap_us.isNull(), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        with_session.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"),
             F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


W3_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 300000000 THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# W4 — last-occurrence-wins (max_by offset)
# ---------------------------------------------------------------------------

def w4_last_wins(spark, sf_dir):
    """extractDeclaredTotal last-offset-wins (TextBlockParsing.php:177-208)
    as max_by(value, (ts, event_id)) per user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"),
                F.round("value", 2).alias("last_value"))
        .orderBy("user_id")
    )


W4_SQL = """
SELECT user_id, event_id AS last_event_id, ROUND(value, 2) AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# W6 — sequence numbering
# ---------------------------------------------------------------------------

def w6_row_number(spark, sf_dir):
    """Preview '#' column (preview.php:756-758): 1-based row numbers per
    invoice ≙ per order."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.withColumn("seq", F.row_number().over(w))
        .select("l_orderkey", "l_linenumber", "seq")
        .orderBy("l_orderkey", "l_linenumber")
    )


W6_SQL = """
SELECT l_orderkey, l_linenumber,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS seq
FROM lineitem WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# U1/U2/U3 — union of strategies, dedup, distinct
# ---------------------------------------------------------------------------

def u1_union_dedup(spark, sf_dir):
    """Union of parse strategies then dedup (TextBlockParsing.php:239-255,
    432-445): two overlapping selections unioned, first-wins dedup via
    row_number over an explicit priority order (NOT dropDuplicates — Spark
    keeps an arbitrary row, SURVEY §2.6 U2 caution)."""
    part = _t(spark, sf_dir, "part")
    a = part.where(F.col("p_size") < 10).withColumn("strategy", F.lit(1))
    b = part.where(F.col("p_retailprice") < 1200).withColumn("strategy", F.lit(2))
    unioned = a.unionByName(b)
    w = Window.partitionBy("p_partkey").orderBy("strategy")
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("p_partkey", "strategy")
        .orderBy("p_partkey")
    )


U1_SQL = """
SELECT p_partkey, strategy FROM (
  SELECT p_partkey, strategy,
         ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY strategy) AS rn
  FROM (
    SELECT p_partkey, 1 AS strategy FROM part WHERE p_size < 10
    UNION ALL
    SELECT p_partkey, 2 AS strategy FROM part WHERE p_retailprice < 1200
  )
) WHERE rn = 1 ORDER BY p_partkey
"""


def u3_distinct_values(spark, sf_dir):
    """Distinct supported extensions (ParserRegistry.php:235-241) shape."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.split(F.col("p_type"), " ").getItem(0).alias("type_class"))
        .distinct()
        .orderBy("type_class")
    )


U3_SQL = """
SELECT DISTINCT string_split(p_type, ' ')[1] AS type_class
FROM part ORDER BY type_class
"""


def u4_fallback_chain(spark, sf_dir):
    """parseWithFallback (ParserRegistry.php:203-230): per key take the
    result of the highest-priority strategy that produced one — expressed
    as one window pass instead of an iterative anti-join loop."""
    orders = _t(spark, sf_dir, "orders")
    pri = F.when(F.col("o_orderstatus") == "O", 0) \
        .when(F.col("o_orderstatus") == "P", 1).otherwise(2)
    w = Window.partitionBy("o_custkey").orderBy(pri, F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("custkey"),
                F.col("o_orderkey").alias("chosen_order"),
                F.col("o_orderstatus").alias("chosen_status"))
        .orderBy("custkey")
    )


U4_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS chosen_order,
       o_orderstatus AS chosen_status
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_custkey
    ORDER BY CASE o_orderstatus WHEN 'O' THEN 0 WHEN 'P' THEN 1 ELSE 2 END,
             o_orderkey) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# T7/T9 — scalar kernels that are SQL-expressible
# ---------------------------------------------------------------------------

def t7_parse_number(spark, sf_dir):
    """parseNumber (TableExtraction.php:422-437) as a column expression:
    strip currency/whitespace, kill thousands commas, extract numeric."""
    ev = _t(spark, sf_dir, "events")
    # synthesize a currency-dirty string ('¥ 6.55 元'), then parse it back:
    # strip currency symbols/whitespace, extract the numeric
    dirty = F.concat(F.lit("¥ "), F.round("value", 2).cast("string"), F.lit(" 元"))
    cleaned = F.regexp_replace(dirty, r"[^0-9.\-]", "")
    return (
        ev.where(F.col("event_id") < 1000)
        .select("event_id", F.round(cleaned.cast("double"), 2).alias("parsed"))
        .orderBy("event_id")
    )


T7_SQL = """
SELECT event_id,
       ROUND(CAST(regexp_replace('¥ ' || CAST(ROUND(value, 2) AS VARCHAR) || ' 元',
                  '[^0-9.\\-]', '', 'g') AS DOUBLE), 2) AS parsed
FROM events WHERE event_id < 1000 ORDER BY event_id
"""


def t9_date_normalize(spark, sf_dir):
    """normalizeDate format cascade (AbstractParser.php:147-177) as a
    coalesce(to_date(...)) chain over re-serialized date strings."""
    orders = _t(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyy/M/d")
    norm = F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(s, F.lit("yyyy/M/d")),
    )
    return (
        orders.select(F.year(norm).alias("order_year"))
        .groupBy("order_year").agg(F.count("*").alias("n"))
        .orderBy("order_year")
    )


T9_SQL = """
SELECT EXTRACT(year FROM COALESCE(
         try_strptime(strftime(o_orderdate, '%Y/%-m/%-d'), '%Y-%m-%d'),
         try_strptime(strftime(o_orderdate, '%Y/%-m/%-d'), '%Y/%m/%d')
       )) AS order_year,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY order_year
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: two joins (customer filtered+broadcastable →
    orders → lineitem), revenue agg in integer cents, top-10. The join
    order lets Catalyst push the segment filter below the join and AQE
    pick broadcast for the shrunken customer side."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1995-03-15")
    rev_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100 + 0.5).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: five-table join with the region/nation dims
    broadcast and the customer-nation == supplier-nation locality
    predicate; revenue per nation in integer cents."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1994-01-01")
        & (F.col("o_orderdate") < "1995-01-01"))
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100 + 0.5).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(rev_cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "s1_scan_filter_sort": (s1_scan_filter_sort, S1_SQL),
    "f4_tolerance_gate": (f4_tolerance_gate, F4_SQL),
    "j1_dim_lookup_join": (j1_dim_lookup_join, J1_SQL),
    "j2_product_join": (j2_product_join, J2_SQL),
    "j3_semi_join": (j3_semi_join, J3_SQL),
    "j4_base_key_pairing": (j4_base_key_pairing, J4_SQL),
    "a5_confidence_mean": (a5_confidence_mean, A5_SQL),
    "a6_argmax_customer": (a6_argmax_customer, A6_SQL),
    "a7_topk_per_group": (a7_topk_per_group, A7_SQL),
    "w2_top_n": (w2_top_n, W2_SQL),
    "w3_gap_sessionize": (w3_gap_sessionize, W3_SQL),
    "w4_last_wins": (w4_last_wins, W4_SQL),
    "w6_row_number": (w6_row_number, W6_SQL),
    "u1_union_dedup": (u1_union_dedup, U1_SQL),
    "u3_distinct_values": (u3_distinct_values, U3_SQL),
    "u4_fallback_chain": (u4_fallback_chain, U4_SQL),
    "t7_parse_number": (t7_parse_number, T7_SQL),
    "t9_date_normalize": (t9_date_normalize, T9_SQL),
}
