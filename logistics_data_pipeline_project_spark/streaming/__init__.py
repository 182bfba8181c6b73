from .landing import stream_file_landing, stream_hourly_event_counts

__all__ = ["stream_file_landing", "stream_hourly_event_counts"]
