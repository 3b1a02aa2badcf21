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

from ..functions import gen_code

ABS_TOL = 0.05   # config.php:17-20
REL_TOL = 0.02


def _invoices_from_extracted(extracted: DataFrame,
                             party_field: str = "supplier_name",
                             party_default: str = "UNKNOWN_SUPPLIER",
                             ) -> DataFrame:
    """Explode the per-turn records array into one row per invoice, keyed
    by (conv_id, turn_idx, invoice_idx) for lineage. The counterparty
    column is supplier_name for the purchase path
    (PurchaseImporter.php:27-28) and customer_name for the sale path
    (SaleImporter.php:26-27); both default like the reference."""
    return (
        extracted
        .select("conv_id", "turn_idx",
                F.posexplode("records").alias("invoice_idx", "inv"))
        .select(
            "conv_id", "turn_idx", "invoice_idx",
            F.coalesce(F.col("inv.source_file"),
                       F.lit("unknown.json")).alias("source_file"),
            F.when(F.trim(F.col(f"inv.{party_field}")) == "",
                   party_default)
            .otherwise(F.coalesce(F.trim(F.col(f"inv.{party_field}")),
                                  F.lit(party_default)))
            .alias(party_field),
            F.col("inv.invoice_date").alias("invoice_date"),
            F.col("inv.declared_total").alias("declared_total"),
            F.col("inv.items").alias("items"),
        )
    )


def _tolerance_split(inv: DataFrame, party_field: str):
    """Shared NO_ITEMS_FOUND / TOTAL_MISMATCH gate
    (PurchaseImporter.php:30-70 ≡ SaleImporter.php:29-70): adds
    calc_total (integer-cents sum of item totals) and splits into
    (accepted, rejects)."""
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
        .select("conv_id", "turn_idx", "source_file", party_field,
                "declared_total", "calc_total",
                F.when(no_items, "NO_ITEMS_FOUND")
                .otherwise("TOTAL_MISMATCH").alias("reason"))
    )
    return inv.where(~(no_items | mismatch)), rejects


def _reference_no(prefix: str):
    """Deterministic reference_no: content hash in place of the
    reference's random {prefix}-YYYYMMDD-HHMMSS (PurchaseImporter.php:43-48,
    SaleImporter.php:44-48 — T20 exclusion, SURVEY §7.3.3)."""
    date_str = F.coalesce(F.col("invoice_date"), F.lit("1970-01-01"))
    return F.concat(
        F.lit(prefix + "-"), F.regexp_replace(date_str, "-", ""), F.lit("-"),
        F.substring(F.md5(F.concat_ws("|", "conv_id",
                                      F.col("turn_idx").cast("string"),
                                      F.col("invoice_idx").cast("string"),
                                      "source_file")), 1, 6))


def _normalized_items(accepted: DataFrame, party_id, party_id_name: str) -> DataFrame:
    """One row per item of an accepted invoice with the reference's
    normalization (PurchaseImporter.php:84-99 ≡ SaleImporter.php:81-98):
    code default via gen_code, name default = code, qty floor to 1,
    total default qty*unit. Lineage and invoice columns ride along so
    facts re-aggregate without a join back."""
    return (
        accepted.select(
            "conv_id", "turn_idx", "invoice_idx", "reference_no",
            "invoice_date", "source_file", "declared_total",
            party_id.alias(party_id_name),
            F.posexplode("items").alias("item_idx", "it"))
        .withColumn("name0", F.trim(F.col("it.name")))
        .withColumn("code0", F.trim(F.col("it.code")))
        .withColumn("gen_base",
                    F.when(F.col("name0") != "", F.col("name0"))
                    .otherwise(F.lit("ITEM")))
        .withColumn(
            "code",
            F.when(F.col("code0") != "", F.col("code0"))
            .otherwise(gen_code(F.col("gen_base"))))
        .withColumn("name",
                    F.when(F.col("name0") != "", F.col("name0"))
                    .otherwise(F.col("code")))
        .withColumn("qty", F.when(F.col("it.qty") <= 0, 1.0)
                    .otherwise(F.coalesce(F.col("it.qty"), F.lit(1.0))))
        .withColumn("unit_price", F.coalesce(F.col("it.unit_price"),
                                             F.lit(0.0)))
        .withColumn("total",
                    F.coalesce(F.col("it.total"),
                               F.round(F.col("qty") * F.col("unit_price"), 2)))
    )


def plan_import(extracted: DataFrame) -> dict[str, DataFrame]:
    """Build the five output DataFrames (no writes). Pure plan — callers
    write with write_import or inspect in tests."""
    inv = _invoices_from_extracted(extracted)
    accepted, rejects = _tolerance_split(inv, "supplier_name")
    accepted = accepted.withColumn("reference_no", _reference_no("pr"))

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

    items = (_normalized_items(accepted, F.xxhash64("supplier_name"),
                               "supplier_id")
             .withColumnRenamed("unit_price", "unit_cost"))

    # ordering key includes invoice_idx: two invoices in the same turn can
    # share a code, and without it the chosen dim row would tie
    # nondeterministically across runs
    first_seen = F.struct("conv_id", "turn_idx", "invoice_idx", "item_idx")
    products = (
        items.groupBy("code")
        .agg(F.min_by("name", first_seen).alias("name"),
             F.min_by("unit_cost", first_seen).alias("cost"))
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


def plan_sale_import(extracted: DataFrame) -> dict[str, DataFrame]:
    """Sale-side star schema (SaleImporter.php:14-204): customers dim
    (getOrCreateCustomer :128-147), products dim priced from the sale
    with cost = round(price * 0.7, 2) (:159), sales fact (insertSale
    :170-190), product_sales fact (insertProductSale :192-204), rejects
    side output (:30-38, :58-70). Same set-oriented shape as plan_import:
    dims are distincts with deterministic xxhash64 surrogate keys, facts
    re-aggregate the item explode with invoice columns riding along — no
    join shuffles anywhere."""
    inv = _invoices_from_extracted(extracted, "customer_name",
                                   "UNKNOWN_CUSTOMER")
    accepted, rejects = _tolerance_split(inv, "customer_name")
    accepted = accepted.withColumn("reference_no", _reference_no("sr"))

    customers = (
        accepted.select("customer_name").distinct()
        .select(F.xxhash64("customer_name").alias("customer_id"),
                F.col("customer_name").alias("name"),
                F.col("customer_name").alias("company_name"),
                F.concat(F.lit("unknown+"),
                         F.regexp_replace(F.lower("customer_name"),
                                          r"[^a-z0-9一-鿿]", ""),
                         F.lit("@example.com")).alias("email"))
    )

    items = _normalized_items(accepted, F.xxhash64("customer_name"),
                              "customer_id")

    # dim priced from the first sale seen (deterministic first-seen order,
    # same as the reference's get-or-create insert order); cost derivation
    # round(price * 0.7, 2) from SaleImporter.php:159
    first_seen = F.struct("conv_id", "turn_idx", "invoice_idx", "item_idx")
    products = (
        items.groupBy("code")
        .agg(F.min_by("name", first_seen).alias("name"),
             F.min_by("unit_price", first_seen).alias("price"))
        .select(F.xxhash64("code").alias("product_id"), "code", "name",
                F.round(F.col("price") * 0.7, 2).alias("cost"), "price")
    )

    sales = (
        items.groupBy("conv_id", "turn_idx", "invoice_idx", "reference_no",
                      "invoice_date", "customer_id", "source_file",
                      "declared_total")
        .agg(F.count("*").alias("item"),
             F.sum("qty").alias("total_qty"),
             (F.sum(F.floor(F.col("total") * 100 + 0.5).cast("long"))
              / 100.0).alias("calc_total"))
        .withColumn("grand_total", F.coalesce("declared_total",
                                              "calc_total"))
        .select("reference_no", "customer_id",
                F.col("source_file").alias("document"), "item", "total_qty",
                F.col("grand_total").alias("total_price"), "grand_total",
                F.col("grand_total").alias("paid_amount"),
                F.col("invoice_date").alias("date"),
                "conv_id", "turn_idx", "invoice_idx")
    )

    product_sales = items.select(
        "reference_no", F.xxhash64("code").alias("product_id"),
        "qty", F.col("unit_price").alias("net_unit_price"), "total",
        F.col("invoice_date").alias("date"))

    return {
        "customers": customers,
        "products": products,
        "sales": sales,
        "product_sales": product_sales,
        "rejects": rejects,
    }


def plan_draft_import(extracted: DataFrame,
                      draft_type: str = "purchase") -> dict[str, DataFrame]:
    """Type dispatch mirroring public/preview.php:114-122: a draft is
    imported by PurchaseImporter unless its type says sale."""
    if draft_type == "purchase":
        return plan_import(extracted)
    return plan_sale_import(extracted)


def write_import(extracted: DataFrame, out_dir: str,
                 draft_type: str = "purchase") -> dict[str, int]:
    """Materialize the import: one atomic parquet write per table (the
    PDO-transaction analog; each table commits via tmp+rename semantics of
    the parquet committer). Returns row counts (A10 manifest).

    The extracted input is persisted for the duration: all five tables
    derive from it, and without the pipeline break each write would
    re-run the Arrow extraction stage — the dominant cost — once per
    table."""
    extracted = extracted.persist()
    try:
        tables = plan_draft_import(extracted, draft_type)
        counts = {}
        for name, df in tables.items():
            path = os.path.join(out_dir, name)
            df.write.mode("overwrite").parquet(path)
            counts[name] = df.sparkSession.read.parquet(path).count()
        return counts
    finally:
        extracted.unpersist()
