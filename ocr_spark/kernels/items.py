"""Invoice-item extraction from parsed tables.

Replicates /root/reference/src/Parsers/Traits/TableExtraction.php:
- scoreTableAsInvoiceItems keyword/data-row/numeric scoring (:230-284)
- selectBestInvoiceTable (threshold 0.3, :292-308) and the DocParser variant
  pickBestTable (no threshold, DocParserJsonParser.php:390-405)
- extractItemsFromTableData / extractItemFromRow (:317-417) incl. the
  summary-row skip, qty/unit_price/total mutual imputation and the composite
  "name - color [size]" naming
- parseNumber (:422-437)
"""

from __future__ import annotations

import re

from .fields import map_header_row
from .php import compile_php, php_float, php_round, php_trim

_HIGH_KW = ["qty", "quantity", "price", "amount", "total",
            "數量", "单价", "單價", "金额", "金額", "合计", "合計"]
_MEDIUM_KW = ["item", "product", "description", "code",
              "品名", "名称", "名稱", "货品", "貨品", "款号", "款號"]
_LOW_KW = ["unit", "size", "color", "规格", "規格", "颜色", "顏色", "备注", "備註"]

_NUMERIC_CELL_RE = compile_php(r"^\d+(?:[.,]\d+)?$", "")
_SKIP_ROW_RE = compile_php(r"^(合计|total|subtotal|grand|小計|sum)$", "iu")
_CURRENCY_STRIP_RE = re.compile(r"[¥￥$€£ \t\n\r\f\v]")
_NUMBER_RE = re.compile(r"-?[\d.]+", re.ASCII)


def score_table_as_invoice_items(table: dict) -> float:
    """TableExtraction::scoreTableAsInvoiceItems (:230-284)."""
    rows = table.get("rows") or []
    if len(rows) < 2:
        return 0.0

    score = 0.0
    header_text = " ".join(str(c) for c in rows[0]).lower()

    for kw in _HIGH_KW:
        if kw in header_text:
            score += 0.15
    for kw in _MEDIUM_KW:
        if kw in header_text:
            score += 0.08
    for kw in _LOW_KW:
        if kw in header_text:
            score += 0.03

    data_rows = len(rows) - 1
    if 1 <= data_rows <= 100:
        score += min(0.2, data_rows * 0.02)

    has_numeric = False
    for row in rows[1:]:
        for cell in row:
            if _NUMERIC_CELL_RE.match(php_trim(str(cell))):
                has_numeric = True
                break
        if has_numeric:
            break
    if has_numeric:
        score += 0.15

    return min(1.0, score)


def select_best_invoice_table(tables: list[dict]) -> dict | None:
    """TableExtraction::selectBestInvoiceTable — threshold 0.3 (:292-308)."""
    if not tables:
        return None
    best, best_score = None, 0.0
    for table in tables:
        s = score_table_as_invoice_items(table)
        if s > best_score:
            best_score, best = s, table
    return best if best_score >= 0.3 else None


def pick_best_table(tables: list[dict]) -> dict | None:
    """DocParserJsonParser::pickBestTable — argmax, NO threshold
    (DocParserJsonParser.php:390-405)."""
    if not tables:
        return None
    best, best_score = None, -1.0
    for table in tables:
        s = score_table_as_invoice_items(table)
        if s > best_score:
            best_score, best = s, table
    return best


def parse_number(s: str) -> float:
    """TableExtraction::parseNumber (:422-437)."""
    if php_trim(s) == "":
        return 0.0
    s = _CURRENCY_STRIP_RE.sub("", s)
    s = s.replace(",", "")
    m = _NUMBER_RE.search(s)
    if m:
        return php_float(m.group(0))
    return 0.0


def extract_item_from_row(row: list, column_map: dict[str, int]) -> dict | None:
    """TableExtraction::extractItemFromRow (:343-417)."""

    def get_value(field: str) -> str:
        idx = column_map.get(field)
        if idx is None or idx >= len(row) or idx < 0:
            return ""
        v = row[idx]
        return php_trim(str(v)) if v is not None else ""

    code = get_value("code")
    name = get_value("name")
    color = get_value("color")
    size = get_value("size")
    qty_str = get_value("qty")
    unit_price_str = get_value("unit_price")
    total_str = get_value("total")

    for val in (code, name):
        if _SKIP_ROW_RE.match(val):
            return None

    if name == "" and code == "":
        return None

    qty = parse_number(qty_str)
    unit_price = parse_number(unit_price_str)
    total = parse_number(total_str)

    if qty <= 0 and unit_price > 0 and total > 0:
        qty = total / unit_price
        if abs(qty - php_round(qty)) < 0.01:
            qty = php_round(qty)
    if qty <= 0:
        qty = 1.0

    if unit_price <= 0 and qty > 0 and total > 0:
        unit_price = total / qty
    if total <= 0 and qty > 0 and unit_price > 0:
        total = qty * unit_price

    full_name = name
    if color != "":
        full_name += " - " + color
    if size != "":
        full_name += " [" + size + "]"

    return {
        "code": code,
        "name": full_name,
        "qty": php_round(qty, 4),
        "unit_price": php_round(unit_price, 4),
        "total": php_round(total, 2),
        "metadata": {
            "color": color,
            "size": size,
            "remark": get_value("remark"),
        },
    }


def extract_items_from_table_data(table: dict, column_map: dict | None = None) -> list[dict]:
    """TableExtraction::extractItemsFromTableData (:317-338)."""
    rows = table.get("rows") or []
    if len(rows) < 2:
        return []
    if not column_map:
        column_map = map_header_row(rows[0])
    items = []
    for row in rows[1:]:
        item = extract_item_from_row(row, column_map)
        if item is not None:
            items.append(item)
    return items
