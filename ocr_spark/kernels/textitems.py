"""Free-text invoice parsing (no table structure).

Replicates /root/reference/src/Parsers/Traits/TextBlockParsing.php:
- header-field extraction: supplier/customer/date/number/declared-total/
  currency (:20-231) incl. the last-offset-wins declared-total scan (:177-208)
- item extraction: multiplication format, line format, list format (:239-400)
- first-wins dedup keyed lower(name)|qty|total (:432-445)
- cleanItemName / cleanEntityName (:405-427)

Span support: ``extract_invoice_header`` also reports (start, end) char
offsets of each matched field value in the source text (PREG_OFFSET_CAPTURE
analog — char offsets, order-equivalent to PHP's byte offsets).
"""

from __future__ import annotations

import re

from .php import (collapse_ws, compile_php, php_float, php_round, php_strlen,
                  php_trim)

# ---- header field patterns (file:line refs above each list) ----------------

_SUPPLIER_PATTERNS = [  # TextBlockParsing.php:35-42
    compile_php(r"供[应應]商[：:]\s*([^\n\r]+)", "u"),
    compile_php(r"供[货貨]商[：:]\s*([^\n\r]+)", "u"),
    compile_php(r"vendor[:\s]+([^\n\r]+)", "i"),
    compile_php(r"supplier[:\s]+([^\n\r]+)", "i"),
    compile_php(r"from[:\s]+([^\n\r]+)", "i"),
    compile_php(r"公司[：:]\s*([^\n\r]+)", "u"),
]
_SUPPLIER_SUFFIX_RE = compile_php(
    r"(有限公司|co\.?\s*ltd|company|trading|enterprise|inc\.?|corp\.?)", "iu")

_CUSTOMER_PATTERNS = [  # TextBlockParsing.php:72-78
    compile_php(r"客[户戶][：:]\s*([^\n\r]+)", "u"),
    compile_php(r"買[家方][：:]\s*([^\n\r]+)", "u"),
    compile_php(r"customer[:\s]+([^\n\r]+)", "i"),
    compile_php(r"bill\s*to[:\s]+([^\n\r]+)", "i"),
    compile_php(r"sold\s*to[:\s]+([^\n\r]+)", "i"),
    compile_php(r"to[:\s]+([^\n\r]+)", "i"),
]

_DATE_PATTERNS = [  # TextBlockParsing.php:94-106 — (pattern, kind)
    (compile_php(r"日期[：:]\s*(\d{4}[-\/]\d{1,2}[-\/]\d{1,2})", "u"), "norm"),
    (compile_php(r"date[:\s]+(\d{4}[-\/]\d{1,2}[-\/]\d{1,2})", "i"), "norm"),
    (compile_php(r"(\d{4}[-\/]\d{1,2}[-\/]\d{1,2})", ""), "norm"),
    (compile_php(r"日期[：:]\s*(\d{1,2}[-\/]\d{1,2}[-\/]\d{4})", "u"), "norm"),
    (compile_php(r"date[:\s]+(\d{1,2}[-\/]\d{1,2}[-\/]\d{4})", "i"), "norm"),
    (compile_php(r"(\d{4})年(\d{1,2})月(\d{1,2})日", "u"), "cjk"),
]

_NUMBER_PATTERNS = [  # TextBlockParsing.php:156-162
    compile_php(r"發票[号號][：:]\s*([A-Za-z0-9\-]+)", "u"),
    compile_php(r"invoice\s*(?:#|no\.?|number)[:\s]*([A-Za-z0-9\-]+)", "i"),
    compile_php(r"單[号號][：:]\s*([A-Za-z0-9\-]+)", "u"),
    compile_php(r"批次[：:]\s*(\d+)", "u"),
    compile_php(r"ref(?:erence)?[:\s]*([A-Za-z0-9\-]+)", "i"),
    compile_php(r"order\s*(?:#|no\.?)[:\s]*([A-Za-z0-9\-]+)", "i"),
]

_TOTAL_PATTERNS = [  # TextBlockParsing.php:178-185
    compile_php(r"grand\s*total[:\s]*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "i"),
    compile_php(r"total\s*(?:amount|due)?[:\s]*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "i"),
    compile_php(r"合[计計][：:]\s*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "u"),
    compile_php(r"總[数數額额][：:]\s*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "u"),
    compile_php(r"本單額[：:]\s*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "u"),
    compile_php(r"amount\s*(?:payable|due)[:\s]*[\$¥￥€£]?\s*([\d,]+\.?\d*)", "i"),
]

_CURRENCY_MAP = [  # TextBlockParsing.php:214-219 — detection order matters
    ("CNY", compile_php(r"¥|￥|rmb|人民币|人民幣", "iu")),
    ("HKD", compile_php(r"hk\$|hkd|港币|港幣", "iu")),
    ("USD", compile_php(r"\$(?!hk)|usd|us\$|美元|美金", "iu")),
    ("EUR", compile_php(r"€|eur|欧元|歐元", "iu")),
    ("GBP", compile_php(r"£|gbp|英镑|英鎊", "iu")),
]

_NUM_TOKEN_RE = compile_php(r"([\d,]+\.?\d*)", "")
_SKIP_LINE_RE = compile_php(r"^(合计|total|subtotal|grand|小計|#|序号|項次)", "iu")

Span = tuple[str, int, int]  # (field, start, end) char offsets


def clean_entity_name(name: str) -> str:
    """TextBlockParsing::cleanEntityName (:419-427)."""
    name = php_trim(collapse_ws(name))
    name = compile_php(r"^(供[应應]商|vendor|supplier|from)[:\s]*", "iu").sub("", name, count=1)
    return name


def clean_item_name(name: str) -> str:
    """TextBlockParsing::cleanItemName (:405-414)."""
    name = re.sub(r"^[\d\.\)\]\-\*\•\s]+", "", name, count=1, flags=re.ASCII)
    name = re.sub(r"[\s\-\*]+$", "", name, count=1, flags=re.ASCII)
    name = collapse_ws(name)
    return php_trim(name)


def extract_supplier_name(text: str, spans: list[Span] | None = None) -> str:
    """TextBlockParsing::extractSupplierName (:34-66)."""
    for pat in _SUPPLIER_PATTERNS:
        m = pat.search(text)
        if m:
            if spans is not None:
                spans.append(("supplier_name", m.start(1), m.end(1)))
            return clean_entity_name(m.group(1))
    for line in text.split("\n"):
        line = php_trim(line)
        if re.match(r"^\d{4}[-\/]", line, re.ASCII):
            continue
        if re.match(r"^[#\*\-]", line, re.ASCII):
            continue
        if 5 < php_strlen(line) < 100:
            if _SUPPLIER_SUFFIX_RE.search(line):
                return clean_entity_name(line)
    return ""


def extract_customer_name(text: str, spans: list[Span] | None = None) -> str:
    """TextBlockParsing::extractCustomerName (:71-88)."""
    for pat in _CUSTOMER_PATTERNS:
        m = pat.search(text)
        if m:
            if spans is not None:
                spans.append(("customer_name", m.start(1), m.end(1)))
            return clean_entity_name(m.group(1))
    return ""


def extract_invoice_date(text: str, spans: list[Span] | None = None) -> str | None:
    """TextBlockParsing::extractInvoiceDate (:93-119)."""
    from .dates import normalize_date_string
    for pat, kind in _DATE_PATTERNS:
        m = pat.search(text)
        if m:
            if spans is not None:
                spans.append(("invoice_date", m.start(0), m.end(0)))
            if kind == "cjk":
                return "%04d-%02d-%02d" % (int(m.group(1)), int(m.group(2)), int(m.group(3)))
            return normalize_date_string(m.group(1))
    return None


def extract_invoice_number(text: str, spans: list[Span] | None = None) -> str | None:
    """TextBlockParsing::extractInvoiceNumber (:155-172)."""
    for pat in _NUMBER_PATTERNS:
        m = pat.search(text)
        if m:
            if spans is not None:
                spans.append(("invoice_number", m.start(1), m.end(1)))
            return php_trim(m.group(1))
    return None


def _last_offset_wins(text: str, patterns: list[re.Pattern],
                      spans: list[Span] | None, field: str) -> float | None:
    """Scan all patterns, keep the match whose group-1 offset is greatest
    (TextBlockParsing.php:187-207 / DocParserJsonParser.php:364-384)."""
    last_value, last_pos, last_end = None, -1, -1
    for pat in patterns:
        for m in pat.finditer(text):
            if m.start(1) > last_pos:
                last_pos, last_end = m.start(1), m.end(1)
                last_value = m.group(1)
    if last_value is None:
        return None
    if spans is not None:
        spans.append((field, last_pos, last_end))
    value = last_value.replace(",", "")
    from .php import php_is_numeric
    return php_float(value) if php_is_numeric(value) else None


def extract_declared_total(text: str, spans: list[Span] | None = None) -> float | None:
    """TextBlockParsing::extractDeclaredTotal (:177-208)."""
    return _last_offset_wins(text, _TOTAL_PATTERNS, spans, "declared_total")


def detect_currency(text: str) -> str | None:
    """TextBlockParsing::detectCurrency (:213-231)."""
    for currency, pat in _CURRENCY_MAP:
        if pat.search(text):
            return currency
    return None


def extract_invoice_header(text: str, spans: list[Span] | None = None) -> dict:
    """TextBlockParsing::extractInvoiceHeader (:20-29)."""
    return {
        "supplier_name": extract_supplier_name(text, spans),
        "customer_name": extract_customer_name(text, spans),
        "invoice_date": extract_invoice_date(text, spans),
        "invoice_number": extract_invoice_number(text, spans),
        "total": extract_declared_total(text, spans),
        "currency": detect_currency(text),
    }


# ---- item extraction from free text ---------------------------------------

_MULT_PATTERNS = [  # TextBlockParsing.php:263-268
    compile_php(r"([^\d\n]+?)\s*[x×]\s*(\d+(?:\.\d+)?)\s*[@＠]\s*(\d+(?:\.\d+)?)", "iu"),
    compile_php(r"([^\d\n]+?)\s*(\d+(?:\.\d+)?)\s*(?:pcs?|件)?\s*[@＠]\s*[\$¥￥]?\s*(\d+(?:\.\d+)?)", "iu"),
]

_LIST_PATTERN = compile_php(
    r"^[\*\-\•\d\.]+\s*(.+?)[\s\-]+[\$¥￥]?\s*([\d,]+\.?\d*)$", "mu")


def parse_multiplication_format(text: str) -> list[dict]:
    """TextBlockParsing::parseMultiplicationFormat (:260-294)."""
    items = []
    # both patterns require a literal @/＠ — skip the two full-text
    # backtracking scans for the common payload without one
    if "@" not in text and "＠" not in text:
        return items
    for pat in _MULT_PATTERNS:
        for m in pat.finditer(text):
            name = clean_item_name(m.group(1))
            if len(name) < 2:
                continue
            qty = php_float(m.group(2))
            unit_price = php_float(m.group(3))
            if qty > 0 and unit_price > 0:
                items.append({
                    "code": "",
                    "name": name,
                    "qty": qty,
                    "unit_price": unit_price,
                    "total": php_round(qty * unit_price, 2),
                    "metadata": {"parse_method": "multiplication"},
                })
    return items


def _line_numbers(text: str) -> list[float]:
    nums = [php_float(n.replace(",", "")) for n in _NUM_TOKEN_RE.findall(text)]
    return [n for n in nums if n > 0]


def parse_line_format(text: str) -> list[dict]:
    """TextBlockParsing::parseLineFormat (:299-370)."""
    items = []
    for line in text.split("\n"):
        line = php_trim(line)
        if line == "":
            continue
        if _SKIP_LINE_RE.search(line):
            continue
        numbers = _line_numbers(line)
        if not numbers:
            continue
        name = _NUM_TOKEN_RE.sub("", line)
        name = clean_item_name(name)
        if len(name) < 2:
            continue

        qty, unit_price, total = 1.0, 0.0, 0.0
        if len(numbers) >= 3:
            qty, unit_price, total = numbers[0], numbers[1], numbers[2]
        elif len(numbers) == 2:
            if numbers[0] <= 100 and numbers[1] > numbers[0]:
                qty, total = numbers[0], numbers[1]
                unit_price = total / qty
            else:
                unit_price, total = numbers[0], numbers[1]
                qty = total / unit_price
        else:
            total = numbers[0]

        if total > 0 and abs(qty * unit_price - total) / total < 0.1:
            items.append({
                "code": "",
                "name": name,
                "qty": php_round(qty, 4),
                "unit_price": php_round(unit_price, 4),
                "total": php_round(total, 2),
                "metadata": {"parse_method": "line"},
            })
    return items


def parse_list_format(text: str) -> list[dict]:
    """TextBlockParsing::parseListFormat (:375-400)."""
    items = []
    for m in _LIST_PATTERN.finditer(text):
        name = clean_item_name(m.group(1))
        total = php_float(m.group(2).replace(",", ""))
        if len(name) >= 2 and total > 0:
            items.append({
                "code": "",
                "name": name,
                "qty": 1,
                "unit_price": total,
                "total": total,
                "metadata": {"parse_method": "list"},
            })
    return items


def deduplicate_items(items: list[dict]) -> list[dict]:
    """TextBlockParsing::deduplicateItems — first-wins, order-sensitive
    (:432-445). Key: mb_strtolower(name)|qty|total with PHP float→string."""
    from .php import php_number_str
    seen = set()
    out = []
    for item in items:
        key = "%s|%s|%s" % (
            str(item["name"]).lower(),
            php_number_str(float(item["qty"])),
            php_number_str(float(item["total"])),
        )
        if key not in seen:
            seen.add(key)
            out.append(item)
    return out


def extract_items_from_text(text: str) -> list[dict]:
    """TextBlockParsing::extractItemsFromText — union of the three
    strategies then first-wins dedup (:239-255)."""
    items = []
    items += parse_multiplication_format(text)
    items += parse_line_format(text)
    items += parse_list_format(text)
    return deduplicate_items(items)
