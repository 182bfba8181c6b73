from .merge import dedup_latest, merge_upsert, scd2_apply, high_watermark
from .router import validity_router

__all__ = [
    "dedup_latest",
    "merge_upsert",
    "scd2_apply",
    "high_watermark",
    "validity_router",
]
