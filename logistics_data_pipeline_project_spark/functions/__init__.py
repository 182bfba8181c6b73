from .scalar import (
    dec,
    exact_avg,
    exact_sum,
    pct,
    delay_percentage,
    try_cast,
    try_to_timestamp,
)

__all__ = [
    "dec",
    "exact_avg",
    "exact_sum",
    "pct",
    "delay_percentage",
    "try_cast",
    "try_to_timestamp",
]
