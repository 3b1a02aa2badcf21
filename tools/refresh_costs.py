#!/usr/bin/env python3
"""Regenerate __spark_entry__._MEASURED_COST from a driver_sim log.

    python tools/driver_sim.py 2>&1 | tee /tmp/driver_sim.log
    python tools/refresh_costs.py /tmp/driver_sim.log

Parses the per-query '[Xs/Ys]' walls (spark + oracle — the driver pays
both; rows-only lines carry a single wall) and rewrites the
_MEASURED_COST dict in __spark_entry__.py, sorted cheapest-first so the
driver's bounded budget scores the maximum rows. Queries absent from
the log keep their previous value; the file's surrounding text is
untouched."""
from __future__ import annotations

import ast
import re
import sys

ENTRY = "__spark_entry__.py"
PAT = re.compile(
    r"^\s*(\w+): (?:ok|rows-only) \(\d+ rows\) "
    r"\[([\d.]+)s(?:/([\d.]+)s)?\]")


def main() -> None:
    log_path = sys.argv[1]
    costs: dict[str, float] = {}
    with open(log_path) as f:
        for line in f:
            m = PAT.match(line)
            if m:
                costs[m.group(1)] = round(
                    float(m.group(2)) + float(m.group(3) or 0.0), 1)
    if not costs:
        raise SystemExit(f"no per-query walls found in {log_path}")

    src = open(ENTRY).read()
    start = src.index("_MEASURED_COST = {")
    end = src.index("\n}", start) + len("\n}")
    old = ast.literal_eval(src[start + len("_MEASURED_COST = "):end])
    merged = {**old, **costs}

    lines = ["_MEASURED_COST = {"]
    row = "   "
    for name in sorted(merged, key=lambda n: (merged[n], n)):
        cell = f" '{name}': {merged[name]},"
        if len(row) + len(cell) > 79:
            lines.append(row)
            row = "   "
        row += cell
    lines.append(row)
    lines.append("}")
    open(ENTRY, "w").write(src[:start] + "\n".join(lines) + src[end:])
    print(f"rewrote {len(merged)} costs ({len(costs)} measured from log)")


if __name__ == "__main__":
    main()
