"""Logistics star-schema model library — the reference's silver layer
(10 incremental models), gold marts (8 dbt models + 10 SQL views), and the
control-table/audit plumbing, re-expressed as DataFrame-in/DataFrame-out
functions. Orchestration (materialization, incremental state, ordering)
lives in ``plans.runner``.
"""

from . import gold, silver  # noqa: F401
