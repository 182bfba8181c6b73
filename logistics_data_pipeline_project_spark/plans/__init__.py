from .incremental import incremental_rollup, read_rollup
from .materialize import TableStore
from .quality import run_checks
from .runner import Model, ModelRunner

__all__ = [
    "Model",
    "ModelRunner",
    "TableStore",
    "incremental_rollup",
    "read_rollup",
    "run_checks",
]
