from .clauses import (
    any_join,
    array_join,
    deterministic_sample,
    final_replacing,
    global_in,
    limit_by,
    with_totals,
)

__all__ = [
    "any_join",
    "array_join",
    "deterministic_sample",
    "final_replacing",
    "global_in",
    "limit_by",
    "with_totals",
]
