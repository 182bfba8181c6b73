from .materialize import TableStore
from .runner import Model, ModelRunner

__all__ = ["Model", "ModelRunner", "TableStore"]
