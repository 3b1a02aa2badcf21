"""Column-expression kernels (reference scalar semantics, JVM-side).

Each function returns a pyspark Column built only from built-in
pyspark.sql.functions, so it stays inside whole-stage codegen — the fast
path the SURVEY §7.2 table assigns to "built-in Spark". The reference
citation on each function is the PHP code whose semantics it re-expresses
(cited for parity checking, not ported).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(c: Column) -> Column:
    """Collapse runs of whitespace to one space and trim
    (AbstractParser.php:138-142 cleanString)."""
    return F.trim(F.regexp_replace(c, r"[ \t\n\x0b\f\r]+", " "))


def clean_cell(c: Column) -> Column:
    """cleanString + kill cells that are only OCR table noise like
    '|---+' (TableExtraction.php:211-222 cleanCellText)."""
    cleaned = clean_string(c)
    return F.when(cleaned.rlike(r"^[\|\-\+]+$"), F.lit("")).otherwise(cleaned)


def parse_number(c: Column) -> Column:
    """Strip currency symbols / whitespace / thousands separators and
    extract the numeric value (TableExtraction.php:422-437 parseNumber;
    Util.php:40-44 money). Returns double, null when no digits survive."""
    stripped = F.regexp_replace(c, r"[¥￥$€£ \t\n\x0b\f\r]", "")
    no_commas = F.regexp_replace(stripped, r",(?=\d{3})", "")
    num = F.regexp_extract(no_commas, r"(-?[\d.]+)", 1)
    return F.when(num == "", None).otherwise(num.cast("double"))


def normalize_amount(c: Column) -> Column:
    """Amount normalization (AbstractParser.php:182-196): parse then round
    to 2 decimals. Spark round() is half-up on positive doubles — same
    observable behavior as PHP round() for the value ranges the engine
    emits (non-negative money)."""
    return F.round(parse_number(c), 2)


def detect_currency(c: Column) -> Column:
    """Symbol/keyword → ISO code (TextBlockParsing.php:213-231). Priority
    order matters: HK$ is checked before the bare $ so the reference's
    `\\$(?!hk)` lookahead is not needed (kept lookahead-free so the same
    logic is expressible in RE2-based engines)."""
    lc = F.lower(c)
    return (
        F.when(lc.contains("hk$") | lc.contains("hkd") | lc.contains("港"), "HKD")
        .when(lc.contains("€") | lc.contains("eur"), "EUR")
        .when(lc.contains("£") | lc.contains("gbp"), "GBP")
        .when(lc.contains("$") | lc.contains("usd"), "USD")
        .when(lc.contains("¥") | lc.contains("￥") | lc.contains("cny")
              | lc.contains("rmb") | lc.contains("人民币") | lc.contains("元"), "CNY")
        .otherwise(F.lit(None).cast("string"))
    )


def ocr_digit_repair(c: Column) -> Column:
    """Aggressive OCR digit repair on digit-like codes
    (InvoiceDataValidator.php:216-271): letter→digit map + full-width
    punctuation, via translate() (single pass, codegen)."""
    return F.translate(c, "OolIZSB，。", "0011258,.")


def slugify(c: Column) -> Column:
    """Lowercase, keep only [a-z0-9] + CJK (Util.php:33-38 slug)."""
    return F.regexp_replace(F.lower(c), r"[^a-z0-9一-鿿]", "")


def gen_code(name: Column) -> Column:
    """Deterministic product-code generation faithful to the importer
    (PurchaseImporter.php:201-205): replace [^A-Z0-9 CJK]+ with '_'
    BEFORE uppercasing (so lowercase runs collapse to '_', CJK is kept),
    24-char prefix, then '_' + md5(name)[0:6]. The validator's random
    ITEM#### fallback (InvoiceDataValidator.php:424-434) is
    nondeterministic and excluded from the parity surface (SURVEY
    §7.3.3). pipeline/importer.py reuses this kernel — one code-gen
    semantics repo-wide."""
    slug = F.substring(F.upper(
        F.regexp_replace(name, r"[^A-Z0-9一-鿿]+", "_")), 1, 24)
    # `substr(...) ?: 'ITEM'` — PHP's ?: treats '' AND '0' as falsy
    slug = F.when(slug.isin("", "0"), "ITEM").otherwise(slug)
    return F.concat(slug, F.lit("_"), F.substring(F.md5(name), 1, 6))


def split_merged(c: Column) -> Column:
    """Merged-document split (GenericMarkdownParser.php:116-148): one
    payload → array of sub-documents. Column variant splits on the '\\n# '
    heading delimiter (delimiter consumed); the Python kernel keeps the
    reference's exact lookahead split for the parse path."""
    return F.split(c, r"\n# ")


def tolerance_ok(declared: Column, calc: Column,
                 abs_tol: float = 0.05, rel_tol: float = 0.02) -> Column:
    """Importer tolerance gate (PurchaseImporter.php:58-70,
    config.php:17-20): pass if |declared-calc| <= abs_tol OR relative
    difference <= rel_tol."""
    diff = F.abs(declared - calc)
    return (diff <= abs_tol) | (diff / F.abs(declared) <= rel_tol)


def impute_item_totals(qty: Column, unit_price: Column,
                       total: Column) -> tuple[Column, Column, Column]:
    """Missing-value imputation (InvoiceDataValidator.php:276-327): from
    any two of (qty, unit_price, total) compute the third; a lone total
    implies qty=1, unit_price=total; qty floors to 1. Returns the three
    repaired columns (pure when/otherwise — no Python)."""
    q = F.when(qty.isNull() & unit_price.isNotNull() & total.isNotNull()
               & (unit_price != 0), F.round(total / unit_price, 4)) \
        .otherwise(qty)
    q = F.when(q.isNull() | (q <= 0), F.lit(1.0)).otherwise(q)
    p = F.when(unit_price.isNull() & total.isNotNull(),
               F.round(total / q, 4)).otherwise(unit_price)
    t = F.when(total.isNull() & p.isNotNull(),
               F.round(q * p, 2)).otherwise(total)
    return q, p, t
