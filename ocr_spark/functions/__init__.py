"""Spark-native column functions (JVM-side, codegen-friendly).

Column-expression twins of the pure-Python kernels in ocr_spark.kernels:
where the reference's scalar semantics are expressible with built-in
pyspark.sql.functions they belong here (whole-stage codegen, no Python
worker); the Python kernels remain the source of truth for the quirky
PHP-exact paths (DOM parsing, permissive dates, offset-capture regex).
"""

from .columns import (clean_cell, clean_string, detect_currency, gen_code,
                      impute_item_totals, normalize_amount, ocr_digit_repair,
                      parse_number, slugify, split_merged, tolerance_ok)

__all__ = [
    "clean_string", "clean_cell", "parse_number", "normalize_amount",
    "detect_currency", "ocr_digit_repair", "slugify", "gen_code",
    "split_merged", "tolerance_ok", "impute_item_totals",
]
