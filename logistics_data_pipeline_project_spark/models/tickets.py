"""Support-ticket flow (SURVEY entry point via
dags/4_logistics_ticket_classifier_full_dag.py): raw JSON tickets →
flattened typed rows (S4/K2, :186-198) → ML classification (U1) →
enriched gold table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.ml_text import classify_tickets


def flatten_tickets(raw: DataFrame) -> DataFrame:
    """customer_support_raw → customer_support_flat
    (dags/4_logistics_ticket_classifier_full_dag.py:186-198): JSON path
    projection + lenient timestamp cast."""
    return raw.select(
        F.col("ticket_id").cast("string").alias("TICKET_ID"),
        F.col("customer.id").cast("string").alias("CUSTOMER_ID"),
        F.col("message.body").cast("string").alias("MESSAGE_TEXT"),
        F.try_to_timestamp(F.col("created_at").cast("string")).alias("CREATED_AT"),
    )


def enrich_tickets(flat: DataFrame, model=None) -> DataFrame:
    """customer_support_flat → CUSTOMER_SUPPORT_ENRICHED (:58-78), with the
    classifier applied distributed (pandas_udf) instead of a driver-side
    pandas loop."""
    return classify_tickets(flat, "MESSAGE_TEXT", "TICKET_CATEGORY", model=model)
