from .materialize import TableStore
from .quality import run_checks
from .runner import Model, ModelRunner

__all__ = ["Model", "ModelRunner", "TableStore", "run_checks"]
