from .landing import stream_file_landing, stream_hourly_event_counts
from .stateful import stream_user_sessions

__all__ = ["stream_file_landing", "stream_hourly_event_counts", "stream_user_sessions"]
