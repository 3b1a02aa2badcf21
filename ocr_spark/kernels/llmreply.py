"""T26 — LLM-reply JSON extraction cascade (LlmAssistedParser.php:306-346).

An LLM reply may be bare JSON, a ```json fenced block, or prose wrapping a
JSON object. parseResponse tries, in order:

1. direct json_decode of the whole reply — note a reply that decodes to a
   SCALAR (``"42"``) stops the cascade here and only fails the final
   is_array check, exactly like the reference;
2. the first ```(json)? fenced block, trimmed (:314-318);
3. the GREEDY ``/\\{[\\s\\S]*\\}/`` match — first '{' to LAST '}', not the
   first balanced object (:321-325);

and returns None unless the winner is an object/array (:327-329).

The record builder mirrors parseResponse's output structure (:331-345)
with calculateTotal (:349-355, sum of raw item totals rounded 2) and
normalizeItems (:360-392: skip items with neither name nor code, qty
floor to 1, fill the missing one of unit_price/total).
"""

from __future__ import annotations

import json
import re
from typing import Any

from .php import php_float, php_round, php_trim


def _floatval(v) -> float:
    """PHP ``(float)`` cast, total: never raises. Strings parse their
    longest numeric prefix ('12.50 USD' → 12.5, 'n/a' → 0.0); bools are
    1/0; arrays cast 1.0 when non-empty, 0.0 when empty; null → 0.0.
    The reference casts every numeric field this way, so a messy reply
    ({'total': '12.50 USD'}) must degrade, not kill the Arrow task."""
    if isinstance(v, bool):
        return 1.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return php_float(v)
    if isinstance(v, (list, dict)):
        return 1.0 if v else 0.0
    return 0.0

_FENCE_RE = re.compile(r"```(?:json)?\s*\n?([\s\S]*?)\n?```")
_BRACE_RE = re.compile(r"\{[\s\S]*\}")

_MISSING = object()


def _decode(text: str) -> Any:
    """json_decode semantics: parse failure AND a literal ``null`` both
    come back as _MISSING (PHP cannot tell them apart either — both
    continue the cascade)."""
    try:
        v = json.loads(text)
    except (ValueError, RecursionError):
        return _MISSING
    return _MISSING if v is None else v


def extract_json_from_reply(reply: str) -> Any:
    """The three-stage cascade. Returns whatever json value won a stage
    (dict, list, or scalar — the scalar case stops the cascade like the
    reference), or None if every stage failed."""
    v = _decode(reply)
    if v is _MISSING:
        m = _FENCE_RE.search(reply)
        if m:
            v = _decode(php_trim(m.group(1)))
    if v is _MISSING:
        m = _BRACE_RE.search(reply)
        if m:
            v = _decode(m.group(0))
    return None if v is _MISSING else v


def llm_calc_total(items: list) -> float:
    """calculateTotal (:349-355): sum of raw item totals, rounded 2."""
    total = 0.0
    for it in items:
        if isinstance(it, dict):
            total += _floatval(it.get("total") or 0)
    return php_round(total, 2)


def llm_normalize_items(items: list) -> list[dict]:
    """normalizeItems (:360-392)."""
    out = []
    for it in items:
        if not isinstance(it, dict):
            continue
        if not it.get("name") and not it.get("code"):
            continue
        qty = _floatval(it.get("qty", 1) or 0)
        if qty <= 0:
            qty = 1.0
        unit_price = _floatval(it.get("unit_price", 0) or 0)
        total = _floatval(it.get("total", 0) or 0)
        if total <= 0 and unit_price > 0:
            total = qty * unit_price
        if unit_price <= 0 and total > 0:
            unit_price = total / qty
        out.append({
            "code": str(it.get("code", "") or ""),
            "name": str(it.get("name", "") or ""),
            "description": str(it.get("description", "") or ""),
            "qty": php_round(qty, 4),
            "unit": str(it.get("unit", "") or ""),
            "unit_price": php_round(unit_price, 4),
            "total": php_round(total, 2),
            "metadata": {},
        })
    return out


def llm_parse_reply(reply: str, source_file: str) -> dict | None:
    """parseResponse (:306-345): cascade, reject non-object winners,
    then build the standard invoice structure (parser=llm_assisted).
    Callers feed this through normalize_invoice exactly as
    LlmAssistedParser::parse does (:105)."""
    j = extract_json_from_reply(reply)
    if not isinstance(j, (dict, list)):
        return None
    get = j.get if isinstance(j, dict) else (lambda k, d=None: d)
    items = get("items") or []
    if not isinstance(items, list):
        items = []
    declared = get("declared_total")
    return {
        "source_file": source_file,
        "supplier_name": get("supplier_name") or "",
        "customer_name": get("customer_name") or "",
        "invoice_date": get("invoice_date"),
        "invoice_number": get("invoice_number"),
        "declared_total": None if declared is None else _floatval(declared),
        "calc_total": llm_calc_total(items),
        "currency": get("currency"),
        "items": llm_normalize_items(items),
        "metadata": {"parser": "llm_assisted"},
    }
