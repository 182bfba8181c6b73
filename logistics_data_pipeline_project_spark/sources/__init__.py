from .warc import encode_warc_records, parse_warc_records, warc_triage
from .readers import (
    has_pending_files,
    read_csv_stage,
    read_json_stage,
    read_seed_csv,
    with_file_metadata,
)

__all__ = [
    "has_pending_files",
    "read_csv_stage",
    "read_json_stage",
    "read_seed_csv",
    "with_file_metadata",
    "encode_warc_records",
    "parse_warc_records",
    "warc_triage",
]
