from .merge import dedup_latest, merge_upsert, scd2_apply, high_watermark
from .router import validity_router
from .scale import (
    day_partition,
    overwrite_partitioned,
    salted_aggregate,
    salted_join,
    write_bucketed,
)

__all__ = [
    "dedup_latest",
    "merge_upsert",
    "scd2_apply",
    "high_watermark",
    "validity_router",
    "write_bucketed",
    "salted_aggregate",
    "salted_join",
    "overwrite_partitioned",
    "day_partition",
]
