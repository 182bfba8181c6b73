from .joins import stream_attribution_join
from .landing import stream_file_landing, stream_hourly_event_counts
from .stateful import (
    stream_dedup_within_watermark,
    stream_first_seen,
    stream_user_sessions,
)
from .upsert import stream_merge_upsert

__all__ = [
    "stream_attribution_join",
    "stream_file_landing",
    "stream_dedup_within_watermark",
    "stream_first_seen",
    "stream_hourly_event_counts",
    "stream_merge_upsert",
    "stream_user_sessions",
]
