"""Set-oriented star-schema import (the reference's MySQL sink, Spark-first).

The reference imports one invoice at a time with ≥2 synchronous SQL
statements per entity/product/item inside one transaction
(PurchaseImporter.php:14-126, getOrCreateSupplier :128-147,
getOrCreateProduct :149-166, insertPurchase :168-186,
insertProductPurchase :188-199) — the per-row round-trip anti-pattern this
engine replaces (SURVEY §3.3). Here the same semantics become four
DataFrames derived in one pass:

  suppliers           dim: distinct supplier name → deterministic id
  products            dim: distinct (code, name) → deterministic id;
                      missing code generated like genCode (:201-205)
  purchases           fact: one row per accepted invoice
  product_purchases   fact: one row per item of an accepted invoice
  rejects             side output: NO_ITEMS_FOUND / TOTAL_MISMATCH rows
                      (PurchaseImporter.php:30-38, 58-70)

Deterministic surrogate keys: xxhash64 of the natural key (name / code)
replaces AUTO_INCREMENT — stable across runs and cluster sizes, no
sequential bottleneck, and the get-or-create SELECT→INSERT race the
reference has per row simply cannot happen (distinct is atomic per batch).
The reference's random reference_no (T20, :43-48) becomes a content hash —
documented nondeterminism exclusion (SURVEY §7.3.3).

Scale notes: dims come from a distinct (map-side combined) over the
accepted invoices; facts never join dims at all — the foreign key IS the
hash of the natural key, so the entire import is two aggregations and a
flatten, no join shuffles. One atomic parquet write per table (the
transaction analog; Iceberg's writeTo().append() when a catalog is
available).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ABS_TOL = 0.05   # config.php:17-20
REL_TOL = 0.02


def _invoices_from_extracted(extracted: DataFrame) -> DataFrame:
    """Explode the per-turn records array into one row per invoice, keyed
    by (conv_id, turn_idx, invoice_idx) for lineage."""
    return (
        extracted
        .select("conv_id", "turn_idx",
                F.posexplode("records").alias("invoice_idx", "inv"))
        .select(
            "conv_id", "turn_idx", "invoice_idx",
            F.coalesce(F.col("inv.source_file"),
                       F.lit("unknown.json")).alias("source_file"),
            F.when(F.trim(F.col("inv.supplier_name")) == "",
                   "UNKNOWN_SUPPLIER")
            .otherwise(F.coalesce(F.trim(F.col("inv.supplier_name")),
                                  F.lit("UNKNOWN_SUPPLIER")))
            .alias("supplier_name"),
            F.col("inv.invoice_date").alias("invoice_date"),
            F.col("inv.declared_total").alias("declared_total"),
            F.col("inv.items").alias("items"),
        )
    )


def plan_import(extracted: DataFrame) -> dict[str, DataFrame]:
    """Build the five output DataFrames (no writes). Pure plan — callers
    write with write_import or inspect in tests."""
    inv = _invoices_from_extracted(extracted)

    # calc total from items (PurchaseImporter.php:54-55), integer cents so
    # parallel partials are order-independent
    calc_cents = F.aggregate(
        F.col("items"), F.lit(0).cast("long"),
        lambda acc, it: acc + F.floor(it["total"] * 100 + 0.5).cast("long"))
    inv = inv.withColumn("calc_total", calc_cents / 100.0)

    no_items = F.size(F.col("items")) == 0
    diff = F.abs(F.col("declared_total") - F.col("calc_total"))
    rel = F.when(F.col("declared_total") != 0.0,
                 diff / F.abs(F.col("declared_total"))).otherwise(diff)
    mismatch = (F.col("declared_total").isNotNull()
                & (diff > ABS_TOL) & (rel > REL_TOL))

    rejects = (
        inv.where(no_items | mismatch)
        .select("conv_id", "turn_idx", "source_file", "supplier_name",
                "declared_total", "calc_total",
                F.when(no_items, "NO_ITEMS_FOUND")
                .otherwise("TOTAL_MISMATCH").alias("reason"))
    )
    accepted = inv.where(~(no_items | mismatch))

    # deterministic reference_no: content hash in place of the reference's
    # random pr-YYYYMMDD-HHMMSS (T20 exclusion)
    date_str = F.coalesce(F.col("invoice_date"), F.lit("1970-01-01"))
    ref_no = F.concat(
        F.lit("pr-"), F.regexp_replace(date_str, "-", ""), F.lit("-"),
        F.substring(F.md5(F.concat_ws("|", "conv_id",
                                      F.col("turn_idx").cast("string"),
                                      F.col("invoice_idx").cast("string"),
                                      "source_file")), 1, 6))
    accepted = accepted.withColumn("reference_no", ref_no)

    supplier_id = F.xxhash64("supplier_name")
    suppliers = (
        accepted.select("supplier_name").distinct()
        .select(F.xxhash64("supplier_name").alias("supplier_id"),
                F.col("supplier_name").alias("name"),
                F.col("supplier_name").alias("company_name"),
                F.concat(F.lit("unknown+"),
                         F.regexp_replace(F.lower("supplier_name"),
                                          r"[^a-z0-9一-鿿]", ""),
                         F.lit("@example.com")).alias("email"))
    )

    # one row per item; code default via genCode (upper slug ≤24 + md5[6]).
    # source_file/declared_total ride along so the purchases fact can be
    # re-aggregated without joining back to `accepted` (one less shuffle
    # join; the importer is then dims-distinct + facts-agg only)
    items = (
        accepted.select(
            "conv_id", "turn_idx", "invoice_idx", "reference_no",
            "invoice_date", "source_file", "declared_total",
            supplier_id.alias("supplier_id"),
            F.posexplode("items").alias("item_idx", "it"))
        .withColumn("name0", F.trim(F.col("it.name")))
        .withColumn("code0", F.trim(F.col("it.code")))
        .withColumn("gen_base",
                    F.when(F.col("name0") != "", F.col("name0"))
                    .otherwise(F.lit("ITEM")))
        .withColumn(
            "code",
            F.when(F.col("code0") != "", F.col("code0")).otherwise(
                F.concat(
                    F.substring(F.upper(F.regexp_replace(
                        "gen_base", r"[^A-Z0-9一-鿿]+", "_")), 1, 24),
                    F.lit("_"),
                    F.substring(F.md5("gen_base"), 1, 6))))
        .withColumn("name",
                    F.when(F.col("name0") != "", F.col("name0"))
                    .otherwise(F.col("code")))
        .withColumn("qty", F.when(F.col("it.qty") <= 0, 1.0)
                    .otherwise(F.coalesce(F.col("it.qty"), F.lit(1.0))))
        .withColumn("unit_cost", F.coalesce(F.col("it.unit_price"),
                                            F.lit(0.0)))
        .withColumn("total",
                    F.coalesce(F.col("it.total"),
                               F.round(F.col("qty") * F.col("unit_cost"), 2)))
    )

    products = (
        items.groupBy("code")
        .agg(F.min_by("name", F.struct("conv_id", "turn_idx", "item_idx"))
             .alias("name"),
             F.min_by("unit_cost",
                      F.struct("conv_id", "turn_idx", "item_idx"))
             .alias("cost"))
        .select(F.xxhash64("code").alias("product_id"), "code", "name",
                "cost")
    )

    purchases = (
        items.groupBy("conv_id", "turn_idx", "invoice_idx", "reference_no",
                      "invoice_date", "supplier_id", "source_file",
                      "declared_total")
        .agg(F.count("*").alias("item"),
             F.sum("qty").alias("total_qty"),
             (F.sum(F.floor(F.col("total") * 100 + 0.5).cast("long"))
              / 100.0).alias("calc_total"))
        .withColumn("grand_total", F.coalesce("declared_total",
                                              "calc_total"))
        .select("reference_no", "supplier_id",
                F.col("source_file").alias("document"), "item", "total_qty",
                "grand_total", F.col("invoice_date").alias("date"),
                "conv_id", "turn_idx", "invoice_idx")
    )

    product_purchases = items.select(
        "reference_no", F.xxhash64("code").alias("product_id"),
        "qty", F.col("qty").alias("recieved"),  # sic — reference column name
        F.col("unit_cost").alias("net_unit_cost"), "total",
        F.col("invoice_date").alias("date"))

    return {
        "suppliers": suppliers,
        "products": products,
        "purchases": purchases,
        "product_purchases": product_purchases,
        "rejects": rejects,
    }


def write_import(extracted: DataFrame, out_dir: str) -> dict[str, int]:
    """Materialize the import: one atomic parquet write per table (the
    PDO-transaction analog; each table commits via tmp+rename semantics of
    the parquet committer). Returns row counts (A10 manifest)."""
    tables = plan_import(extracted)
    counts = {}
    for name, df in tables.items():
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        counts[name] = df.sparkSession.read.parquet(path).count()
    return counts
