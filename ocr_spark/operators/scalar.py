"""Scalar-kernel + remaining-shape queries (SURVEY §2 coverage widening).

Covers the operators the first relational layer left out: A1/A2 explicit
invoice totals, A3 file summary, A4 validation summary, F3 rejects
side-output, U2 composite-key first-wins dedup, W5 first-match cascade,
and the SQL-expressible T-kernels (T13 currency, T17 OCR repair, T18
imputation, T19 code gen, T21 slug, T23 merged split). All built on
ocr_spark.functions column kernels — JVM-side, no Python workers — each
with a DuckDB oracle (RE2-safe regex only on the oracle side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import (detect_currency, gen_code, impute_item_totals,
                         ocr_digit_repair, slugify, split_merged,
                         tolerance_ok)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A1/A2 — per-invoice calc_total and total_qty, explicitly
# ---------------------------------------------------------------------------

def a1_a2_invoice_totals(spark, sf_dir):
    """calc_total and total_qty per invoice (DocParserJsonParser.php:144;
    PurchaseImporter.php:169-172). Money is summed as exact integer cents
    (floor(x*100+0.5)) — the summation-order-independent representation a
    100 TB aggregation needs anyway (double sums are order-dependent under
    parallel partial aggregation; bigint cents are not). Hash agg with
    map-side partials; the key filter prunes at the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)).cast("long")
    return (
        li.where(F.col("l_orderkey") <= 5000)
        .groupBy("l_orderkey")
        .agg((F.sum(cents) / 100.0).alias("calc_total"),
             F.round(F.sum("l_quantity"), 2).alias("total_qty"),
             F.count("*").alias("n_items"))
        .orderBy("l_orderkey")
    )


A1_A2_SQL = """
SELECT l_orderkey,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
         / 100.0 AS calc_total,
       ROUND(SUM(l_quantity), 2) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem WHERE l_orderkey <= 5000
GROUP BY l_orderkey ORDER BY l_orderkey
"""


# ---------------------------------------------------------------------------
# A3 — file summary: count + total size by extension
# ---------------------------------------------------------------------------

def a3_file_summary(spark, sf_dir):
    """getSummary (FileScanner.php:230-249): counts and total bytes per
    extension → per (source, lang) over documents."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.avg("n_chars"), 2).alias("avg_chars"))
        .orderBy("source", "lang")
    )


A3_SQL = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents GROUP BY source, lang ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# A4 — validation batch summary (count_if flags)
# ---------------------------------------------------------------------------

def a4_validation_summary(spark, sf_dir):
    """validateBatch counters (InvoiceDataValidator.php:103-132): per
    group, how many rows pass each range check (T24 bounds re-used as the
    flag predicates) — one pass, sum(when) partial-aggregated."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.when(F.col("l_quantity") <= 50, 1).otherwise(0)).alias("n_qty_ok"),
             F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias("n_negative"),
             F.sum(F.when(
                 F.abs(F.col("l_quantity") * (F.col("l_extendedprice") / F.col("l_quantity"))
                       - F.col("l_extendedprice")) > 0.01, 1).otherwise(0)).alias("n_math_warn"))
        .orderBy("l_returnflag")
    )


A4_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_quantity <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_qty_ok,
       CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       CAST(SUM(CASE WHEN ABS(l_quantity * (l_extendedprice / l_quantity)
                        - l_extendedprice) > 0.01
                THEN 1 ELSE 0 END) AS BIGINT) AS n_math_warn
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# F3 — empty-invoice rejects as an anti-join side output
# ---------------------------------------------------------------------------

def f3_rejects_antijoin(spark, sf_dir):
    """NO_ITEMS_FOUND rejects (PurchaseImporter.php:30-38) set-oriented:
    customers with no urgent order via left_anti join — the filter on the
    probe side is pushed to the parquet scan before the anti join
    (Catalyst), and AQE handles skew on the join key."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rejected"))
        .orderBy("c_mktsegment")
    )


F3_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_rejected
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# U2 — composite-key first-wins dedup
# ---------------------------------------------------------------------------

def u2_first_wins_dedup(spark, sf_dir):
    """Dedup keyed lower(name)|qty|total keeping the FIRST occurrence
    (TextBlockParsing.php:432-445). Spark's dropDuplicates keeps an
    arbitrary row, so first-wins is row_number()==1 over the explicit
    arrival order (SURVEY §2.6 U2 caution) — here (l_orderkey,
    l_linenumber) is the arrival order and (qty, price) the composite
    key within the order."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_quantity", "l_extendedprice") \
        .orderBy("l_linenumber")
    return (
        li.where(F.col("l_orderkey") <= 2000)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity",
                F.round("l_extendedprice", 2).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
    )


U2_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       ROUND(l_extendedprice, 2) AS price
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY l_orderkey, l_quantity, l_extendedprice
      ORDER BY l_linenumber) AS rn
  FROM lineitem WHERE l_orderkey <= 2000
) WHERE rn = 1 ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# W5 — first-match-wins pattern cascade
# ---------------------------------------------------------------------------

def w5_first_match_cascade(spark, sf_dir):
    """Priority-ordered pattern cascade (TextBlockParsing.php:44-49;
    SmartFieldMapping.php:92-98): coalesce of regexp_extract attempts —
    first pattern that hits wins."""
    part = _t(spark, sf_dir, "part")
    def _hit(pat):
        ex = F.regexp_extract(F.col("p_type"), pat, 1)
        return F.when(ex == "", None).otherwise(ex)
    matched = F.coalesce(
        _hit(r"(ANODIZED|BURNISHED)"),
        _hit(r"(BRUSHED|PLATED)"),
        _hit(r"(POLISHED)"),
        F.lit("other"),
    )
    return (
        part.select(matched.alias("finish"))
        .groupBy("finish").agg(F.count("*").alias("n"))
        .orderBy("finish")
    )


W5_SQL = """
SELECT COALESCE(
         NULLIF(regexp_extract(p_type, '(ANODIZED|BURNISHED)', 1), ''),
         NULLIF(regexp_extract(p_type, '(BRUSHED|PLATED)', 1), ''),
         NULLIF(regexp_extract(p_type, '(POLISHED)', 1), ''),
         'other') AS finish,
       COUNT(*) AS n
FROM part GROUP BY 1 ORDER BY finish
"""


# ---------------------------------------------------------------------------
# T13 — currency detection
# ---------------------------------------------------------------------------

def t13_currency_detect(spark, sf_dir):
    """detectCurrency (TextBlockParsing.php:213-231) over synthesized
    price strings — symbol chosen deterministically per order key. The
    HK$-before-$ priority replaces the reference's `\\$(?!hk)` lookahead
    (RE2-safe, see functions.detect_currency)."""
    orders = _t(spark, sf_dir, "orders")
    sym = (F.when(F.col("o_orderkey") % 5 == 0, "¥")
           .when(F.col("o_orderkey") % 5 == 1, "HK$")
           .when(F.col("o_orderkey") % 5 == 2, "$")
           .when(F.col("o_orderkey") % 5 == 3, "€")
           .otherwise("£"))
    text = F.concat(F.lit("total: "), sym, F.col("o_totalprice").cast("string"))
    return (
        orders.select(detect_currency(text).alias("currency"))
        .groupBy("currency").agg(F.count("*").alias("n"))
        .orderBy("currency")
    )


T13_SQL = """
WITH tagged AS (
  SELECT 'total: ' || CASE o_orderkey % 5
           WHEN 0 THEN '¥' WHEN 1 THEN 'HK$' WHEN 2 THEN '$'
           WHEN 3 THEN '€' ELSE '£' END
         || CAST(o_totalprice AS VARCHAR) AS text
  FROM orders
)
SELECT CASE
         WHEN contains(lower(text), 'hk$') THEN 'HKD'
         WHEN contains(lower(text), '€') THEN 'EUR'
         WHEN contains(lower(text), '£') THEN 'GBP'
         WHEN contains(lower(text), '$') THEN 'USD'
         WHEN contains(lower(text), '¥') THEN 'CNY'
       END AS currency,
       COUNT(*) AS n
FROM tagged GROUP BY 1 ORDER BY currency
"""


# ---------------------------------------------------------------------------
# T17 — OCR digit repair
# ---------------------------------------------------------------------------

def t17_ocr_repair(spark, sf_dir):
    """OCR char repair (InvoiceDataValidator.php:216-271): corrupt digit
    strings deterministically (0→O, 1→l), repair with the translate()
    map, verify round-trip — single codegen'd projection."""
    ev = _t(spark, sf_dir, "events")
    corrupted = F.translate(F.col("event_id").cast("string"), "01", "Ol")
    repaired = ocr_digit_repair(corrupted)
    return (
        ev.where(F.col("event_id") < 2000)
        .select("event_id", repaired.alias("repaired"),
                (repaired == F.col("event_id").cast("string")).cast("int")
                .alias("roundtrip_ok"))
        .orderBy("event_id")
    )


T17_SQL = """
SELECT event_id,
       translate(translate(CAST(event_id AS VARCHAR), '01', 'Ol'),
                 'OolIZSB，。', '0011258,.') AS repaired,
       CASE WHEN translate(translate(CAST(event_id AS VARCHAR), '01', 'Ol'),
                 'OolIZSB，。', '0011258,.') = CAST(event_id AS VARCHAR)
            THEN 1 ELSE 0 END AS roundtrip_ok
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# T18 — missing-value imputation
# ---------------------------------------------------------------------------

def t18_imputation(spark, sf_dir):
    """Imputation cases (InvoiceDataValidator.php:276-327): null out one
    of (qty, unit_price, total) per row deterministically, recompute it
    from the other two, check against the original — when/otherwise
    column algebra, no UDF.

    Values are synthesized binary-exact (integer qty, quarter-dollar
    prices) so round() never sits on a decimal edge — engine rounding-mode
    differences on doubles cannot leak into the comparison."""
    li = _t(spark, sf_dir, "lineitem")
    price = ((F.col("l_partkey") % 1000) + 1) * 0.25
    total = F.col("l_quantity") * price
    case = F.col("l_orderkey") % 3
    qty0 = F.when(case == 0, None).otherwise(F.col("l_quantity"))
    price0 = F.when(case == 1, None).otherwise(price)
    total0 = F.when(case == 2, None).otherwise(total)
    q, p, t = impute_item_totals(qty0, price0, total0)
    return (
        li.where(F.col("l_orderkey") <= 3000)
        .select("l_orderkey", "l_linenumber",
                F.round(q, 4).alias("qty_fixed"),
                F.round(p, 4).alias("price_fixed"),
                F.round(t, 2).alias("total_fixed"))
        .orderBy("l_orderkey", "l_linenumber")
    )


T18_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS qty,
         ((l_partkey % 1000) + 1) * 0.25 AS price,
         l_quantity * (((l_partkey % 1000) + 1) * 0.25) AS total,
         l_orderkey % 3 AS c
  FROM lineitem WHERE l_orderkey <= 3000
), nulled AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN c = 0 THEN NULL ELSE qty END AS qty,
         CASE WHEN c = 1 THEN NULL ELSE price END AS price,
         CASE WHEN c = 2 THEN NULL ELSE total END AS total
  FROM base
), fixq AS (
  SELECT l_orderkey, l_linenumber, price, total,
         COALESCE(CASE WHEN qty IS NULL AND price IS NOT NULL
                        AND total IS NOT NULL AND price != 0
                       THEN ROUND(total / price, 4) ELSE qty END, 1.0) AS q0
  FROM nulled
), fixed AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN q0 <= 0 THEN 1.0 ELSE q0 END AS q,
         CASE WHEN price IS NULL AND total IS NOT NULL
              THEN ROUND(total / (CASE WHEN q0 <= 0 THEN 1.0 ELSE q0 END), 4)
              ELSE price END AS p,
         total
  FROM fixq
)
SELECT l_orderkey, l_linenumber,
       ROUND(q, 4) AS qty_fixed,
       ROUND(p, 4) AS price_fixed,
       ROUND(CASE WHEN total IS NULL AND p IS NOT NULL
                  THEN ROUND(q * p, 2) ELSE total END, 2) AS total_fixed
FROM fixed ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# T19 — deterministic code generation
# ---------------------------------------------------------------------------

def t19_code_gen(spark, sf_dir):
    """Code generation (PurchaseImporter.php:201-205): upper slug prefix +
    md5 suffix — md5() keeps it deterministic (the reference's random
    ITEM#### fallback is excluded, SURVEY §7.3.3)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.where(F.col("p_partkey") <= 2000)
        .select("p_partkey", gen_code(F.col("p_name")).alias("code"))
        .orderBy("p_partkey")
    )


T19_SQL = """
SELECT p_partkey,
       CASE WHEN substring(upper(regexp_replace(p_name,
                 '[^A-Z0-9\\x{4e00}-\\x{9fff}]+', '_', 'g')), 1, 24)
                 IN ('', '0') THEN 'ITEM'
            ELSE substring(upper(regexp_replace(p_name,
                 '[^A-Z0-9\\x{4e00}-\\x{9fff}]+', '_', 'g')), 1, 24) END
       || '_' || substring(md5(p_name), 1, 6) AS code
FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# T21 — slug
# ---------------------------------------------------------------------------

def t21_slug(spark, sf_dir):
    """slug (Util.php:33-38): lowercase, keep [a-z0-9] + CJK."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_custkey") <= 2000)
        .select("c_custkey", slugify(F.col("c_name")).alias("slug"))
        .orderBy("c_custkey")
    )


T21_SQL = """
SELECT c_custkey,
       regexp_replace(lower(c_name), '[^a-z0-9\\x{4e00}-\\x{9fff}]', '', 'g') AS slug
FROM customer WHERE c_custkey <= 2000 ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# T23 — merged-document split + explode
# ---------------------------------------------------------------------------

def t23_split_explode(spark, sf_dir):
    """Merged-file split (GenericMarkdownParser.php:116-148): one payload
    → many sub-documents via split + posexplode (the natural one-to-many
    explode; n_parts exposed like the reference's `file#partN` naming)."""
    sup = _t(spark, sf_dir, "supplier")
    merged = F.concat(
        F.lit("# invoice A\nsupplier: "), F.col("s_name"),
        F.lit("\n# invoice B\nnation: "), F.col("s_nationkey").cast("string"),
        F.lit("\n# invoice C\nacct: "), F.round("s_acctbal", 2).cast("string"))
    parts = split_merged(merged)
    return (
        sup.select("s_suppkey", F.posexplode(parts).alias("part_idx", "part_text"))
        .withColumn("part_idx", F.col("part_idx") + 1)
        .orderBy("s_suppkey", "part_idx")
    )


T23_SQL = """
WITH m AS (
  SELECT s_suppkey,
         string_split(
           '# invoice A' || chr(10) || 'supplier: ' || s_name ||
           chr(10) || '# invoice B' || chr(10) || 'nation: ' ||
           CAST(s_nationkey AS VARCHAR) ||
           chr(10) || '# invoice C' || chr(10) || 'acct: ' ||
           CAST(ROUND(s_acctbal, 2) AS VARCHAR),
           chr(10) || '# ') AS parts
  FROM supplier
)
SELECT s_suppkey,
       unnest(range(1, len(parts) + 1)) AS part_idx,
       unnest(parts) AS part_text
FROM m
ORDER BY s_suppkey, part_idx
"""


# ---------------------------------------------------------------------------
# F4b — tolerance gate as a reusable predicate (functions.tolerance_ok)
# ---------------------------------------------------------------------------

def f4b_tolerance_predicate(spark, sf_dir):
    """tolerance_ok column kernel applied to synthetic declared/calc pairs
    (declared = calc + deterministic jitter) — the pure-predicate variant
    of f4_tolerance_gate."""
    orders = _t(spark, sf_dir, "orders")
    jitter = ((F.col("o_orderkey") % 7) - 3) / F.lit(100.0)  # -0.03..0.03
    declared = F.round(F.col("o_totalprice") + jitter * F.col("o_totalprice"), 2)
    ok = tolerance_ok(declared, F.col("o_totalprice"))
    return (
        orders.select(ok.cast("int").alias("passed"))
        .groupBy("passed").agg(F.count("*").alias("n"))
        .orderBy("passed")
    )


F4B_SQL = """
WITH j AS (
  SELECT o_totalprice AS calc,
         ROUND(o_totalprice + ((o_orderkey % 7) - 3) / 100.0 * o_totalprice, 2)
           AS declared
  FROM orders
)
SELECT CASE WHEN ABS(declared - calc) <= 0.05
              OR ABS(declared - calc) / ABS(declared) <= 0.02
            THEN 1 ELSE 0 END AS passed,
       COUNT(*) AS n
FROM j GROUP BY 1 ORDER BY passed
"""


# ---------------------------------------------------------------------------
# S6 — JSON reader with null-on-bad-input error accounting
# ---------------------------------------------------------------------------

def s6_json_reader(spark, sf_dir):
    """Util::readJson (Util.php:21-27) as from_json over the events
    props payload: nulls (bad JSON) are *counted* as error metrics rather
    than thrown (SURVEY §2.1 S6) — the set-oriented error contract."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    ev = _t(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json(F.col("props"), schema)
    return (
        ev.select(F.col("event_type"), parsed.getField("k").alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_bad"),
             F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


S6_SQL = """
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# T26 — LLM-reply JSON extraction cascade
# ---------------------------------------------------------------------------

def t26_llm_json_cascade(spark, sf_dir):
    """T26 (LlmAssistedParser.php:306-329): direct json parse → ```json
    fenced block → greedy {...} match. Replies synthesized from
    events.props in four deterministic shapes (bare / fenced / prose-
    wrapped / no-json), cascade applied in an Arrow-batched kernel stage
    (kernels/llmreply.py). ok flags an object/array winner; k is the
    extracted payload field."""
    ev = _t(spark, sf_dir, "events")
    m = F.col("event_id") % 4
    reply = (
        F.when(m == 0, F.col("props"))
        .when(m == 1, F.concat(F.lit("Here is the result:\n```json\n"),
                               F.col("props"), F.lit("\n```")))
        .when(m == 2, F.concat(F.lit("The extracted data is "),
                               F.col("props"), F.lit(" as requested.")))
        .otherwise(F.lit("no json here, sorry")))
    src = ev.select("event_id", reply.alias("reply"))

    def _stage(batches):
        import pandas as pd

        from ..kernels.llmreply import extract_json_from_reply

        for pdf in batches:
            oks, ks = [], []
            for r in pdf["reply"]:
                j = extract_json_from_reply(r or "")
                ok = isinstance(j, (dict, list))
                oks.append(1 if ok else 0)
                k = j.get("k") if isinstance(j, dict) else None
                ks.append(None if k is None else int(k))
            yield pd.DataFrame({"event_id": pdf["event_id"],
                                "ok": oks, "k": ks})

    return (src.mapInPandas(_stage, "event_id long, ok int, k int")
            .orderBy("event_id"))


T26_SQL = """
WITH r AS (
  SELECT event_id,
         CASE CAST(event_id % 4 AS INTEGER)
           WHEN 0 THEN props
           WHEN 1 THEN 'Here is the result:' || chr(10) || '```json' ||
                       chr(10) || props || chr(10) || '```'
           WHEN 2 THEN 'The extracted data is ' || props || ' as requested.'
           ELSE 'no json here, sorry' END AS reply
  FROM events
),
parsed AS (
  SELECT event_id,
         CASE
           WHEN json_valid(reply) THEN reply
           WHEN json_valid(trim(regexp_extract(reply,
                  '```(?:json)?\\s*\\n?([\\s\\S]*?)\\n?```', 1)))
             THEN trim(regexp_extract(reply,
                  '```(?:json)?\\s*\\n?([\\s\\S]*?)\\n?```', 1))
           WHEN json_valid(regexp_extract(reply, '\\{[\\s\\S]*\\}', 0))
             THEN regexp_extract(reply, '\\{[\\s\\S]*\\}', 0)
           ELSE NULL END AS j
  FROM r
)
SELECT event_id,
       CASE WHEN j IS NOT NULL AND json_type(j) IN ('OBJECT', 'ARRAY')
            THEN 1 ELSE 0 END AS ok,
       CAST(json_extract(j, '$.k') AS INTEGER) AS k
FROM parsed ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# T1 — cleanString
# ---------------------------------------------------------------------------

def t1_clean_string(spark, sf_dir):
    """cleanString (AbstractParser.php:138-142): collapse whitespace runs,
    trim — applied to deliberately whitespace-dirtied part names."""
    from ..functions import clean_string
    part = _t(spark, sf_dir, "part")
    dirty = F.concat(F.lit("  "), F.regexp_replace("p_name", " ", "   "),
                     F.lit("\t"))
    return (
        part.where(F.col("p_partkey") <= 1500)
        .select("p_partkey", clean_string(dirty).alias("cleaned"))
        .orderBy("p_partkey")
    )


T1_SQL = """
SELECT p_partkey,
       trim(regexp_replace('  ' || replace(p_name, ' ', '   ') || chr(9),
                           '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS cleaned
FROM part WHERE p_partkey <= 1500 ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# A8 — max-of-counts (maxCols analog)
# ---------------------------------------------------------------------------

def a8_max_cols(spark, sf_dir):
    """maxCols = max over rows of column count (TableExtraction.php:82,203)
    — expressed over document word counts per source."""
    docs = _t(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), r"[ \t\n\x0b\f\r]+"))
    return (
        docs.select("source", n_words.alias("n_words"))
        .groupBy("source")
        .agg(F.max("n_words").alias("max_words"),
             F.min("n_words").alias("min_words"),
             F.count("*").alias("n"))
        .orderBy("source")
    )


A8_SQL = """
SELECT source,
       MAX(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'))) AS max_words,
       MIN(len(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'))) AS min_words,
       COUNT(*) AS n
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# J2b — Sale-variant product get-or-create with derived cost
# ---------------------------------------------------------------------------

def j2b_sale_cost_derivation(spark, sf_dir):
    """SaleImporter's product creation derives cost = round(price*0.7, 2)
    (SaleImporter.php:159) — the one semantic difference from the
    purchase path. Exact-cents arithmetic (price scaled by 7, floor+0.5)
    keeps both engines bit-identical."""
    part = _t(spark, sf_dir, "part")
    cost = (F.floor(F.col("p_retailprice") * 70 + 0.5) / 100.0)
    return (
        part.where(F.col("p_partkey") <= 2000)
        .select("p_partkey",
                F.round("p_retailprice", 2).alias("price"),
                cost.alias("derived_cost"))
        .orderBy("p_partkey")
    )


J2B_SQL = """
SELECT p_partkey, ROUND(p_retailprice, 2) AS price,
       FLOOR(p_retailprice * 70 + 0.5) / 100.0 AS derived_cost
FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# A11 — distinct-count metrics (exact; approx variant is free via HLL)
# ---------------------------------------------------------------------------

def a11_distinct_users(spark, sf_dir):
    """Run-metrics distinct counts (BENCH report shape, SURVEY §2.4 note):
    exact count_distinct per group — partial aggregation handles the
    two-phase distinct; the approx_count_distinct variant swaps in for
    the 100 TB path (HLL sketches merge associatively)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


A11_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# A12/A13/A14 — aggregation breadth the reference lacks but Catalyst
# gives free (SURVEY §2.4 note): exact percentiles, rollup, pivot
# ---------------------------------------------------------------------------

def a12_percentiles(spark, sf_dir):
    """Exact continuous percentiles of event value per type (Spark
    `percentile` == DuckDB `quantile_cont`, both linear interpolation).
    The approx variant (percentile_approx / KLL) swaps in at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
             F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
             F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"))
        .orderBy("event_type")
    )


A12_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def a13_rollup(spark, sf_dir):
    """Rollup over (priority, status): subtotals + grand total in one
    pass — partial aggregation covers every grouping set."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"),
             (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
              / 100.0).alias("total"))
        .orderBy(F.col("o_orderpriority").asc_nulls_first(),
                 F.col("o_orderstatus").asc_nulls_first())
    )


A13_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def a14_pivot(spark, sf_dir):
    """Pivot event counts into one column per type (fixed pivot values →
    no extra pass to discover them; expressed as conditional aggregation
    in the oracle so both engines share exact semantics)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .where(F.col("user_id") < 25)
        .orderBy("user_id")
    )


A14_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events WHERE user_id < 25
GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# W3b — native session_window (batch) vs gaps-and-islands oracle
# ---------------------------------------------------------------------------

def w3b_session_window(spark, sf_dir):
    """Spark's native session_window (the streaming-ready form of the
    reference's Y-gap grouping, TextBlockParser.php:219-263) run in batch
    — the oracle proves it equals the classic lag+cumsum gaps-and-islands
    SQL. Streaming twin: ocr_spark.streaming.sessionize_by_gap."""
    from ..streaming import sessionize_by_gap
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    return (
        sessionize_by_gap(ev, gap="30 minutes")
        .orderBy("user_id", "session_start")
    )


W3B_SQL = """
WITH e AS (
  SELECT user_id, ts, value,
         -- >= (not >): Spark session_window merges on the half-open
         -- interval [start, last+gap), so an event arriving EXACTLY gap
         -- after the previous one starts a NEW session; the oracle must
         -- break on >= to match that boundary convention
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id < 20
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         / 100.0 AS total_value
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


QUERIES = {
    "a1_a2_invoice_totals": (a1_a2_invoice_totals, A1_A2_SQL),
    "a8_max_cols": (a8_max_cols, A8_SQL),
    "a11_distinct_users": (a11_distinct_users, A11_SQL),
    "a12_percentiles": (a12_percentiles, A12_SQL),
    "a13_rollup": (a13_rollup, A13_SQL),
    "a14_pivot": (a14_pivot, A14_SQL),
    "j2b_sale_cost_derivation": (j2b_sale_cost_derivation, J2B_SQL),
    "s6_json_reader": (s6_json_reader, S6_SQL),
    "t1_clean_string": (t1_clean_string, T1_SQL),
    "w3b_session_window": (w3b_session_window, W3B_SQL),
    "a3_file_summary": (a3_file_summary, A3_SQL),
    "a4_validation_summary": (a4_validation_summary, A4_SQL),
    "f3_rejects_antijoin": (f3_rejects_antijoin, F3_SQL),
    "f4b_tolerance_predicate": (f4b_tolerance_predicate, F4B_SQL),
    "u2_first_wins_dedup": (u2_first_wins_dedup, U2_SQL),
    "w5_first_match_cascade": (w5_first_match_cascade, W5_SQL),
    "t13_currency_detect": (t13_currency_detect, T13_SQL),
    "t17_ocr_repair": (t17_ocr_repair, T17_SQL),
    "t18_imputation": (t18_imputation, T18_SQL),
    "t19_code_gen": (t19_code_gen, T19_SQL),
    "t21_slug": (t21_slug, T21_SQL),
    "t23_split_explode": (t23_split_explode, T23_SQL),
    "t26_llm_json_cascade": (t26_llm_json_cascade, T26_SQL),
}
