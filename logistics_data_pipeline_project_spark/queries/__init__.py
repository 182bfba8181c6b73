"""Driver-facing query catalog.

Importing this package populates ``REGISTRY`` with every implemented query:
each entry carries the PySpark callable ``(spark, sf_dir) -> DataFrame`` and
(where SQL-expressible) the equivalent DuckDB oracle SQL used by the
driver's correctness gate (see repo-root ``__spark_entry__.py``).
"""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Populate the registry.
from . import relational  # noqa: E402,F401
from . import llmdata  # noqa: E402,F401
from . import analytics  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
