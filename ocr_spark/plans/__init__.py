"""Physical-plan audit helpers (the ".explain and iterate" discipline).

The reference has no planner (SURVEY §4); on Spark the plan IS the
performance contract, so this package makes plan properties assertable:
pushed filters reached the parquet scan, small dims broadcast, the
extraction stage shuffles at most once, codegen spans cover the
relational operators. tests/test_plans.py pins these for the headline
queries so a regression that silently de-optimizes a plan fails CI.
"""

from .audit import (codegen_stage_count, exchange_count, formatted_plan,
                    has_broadcast_hash_join, has_sort_merge_join,
                    pushed_filters, scan_read_schema)

__all__ = [
    "formatted_plan", "pushed_filters", "scan_read_schema",
    "has_broadcast_hash_join", "has_sort_merge_join", "exchange_count",
    "codegen_stage_count",
]
