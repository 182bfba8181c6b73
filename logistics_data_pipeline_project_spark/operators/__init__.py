from .merge import (
    dedup_latest,
    high_watermark,
    merge_upsert,
    scd2_apply,
    scd2_as_of,
)
from .router import validity_router
from .scale import (
    backfill_partitions,
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
    "scd2_as_of",
    "high_watermark",
    "validity_router",
    "write_bucketed",
    "salted_aggregate",
    "salted_join",
    "overwrite_partitioned",
    "backfill_partitions",
    "day_partition",
]
