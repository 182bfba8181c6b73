"""Stream-stream joins (beyond-reference streaming surface, SURVEY §2.10).

The reference has no streaming at all; its closest batch analogue is the
order⋈shipment fact join (dags/logistics-gold-metrics-sql.py:141,159). The
streaming-correct version of that join needs BOTH sides watermarked and an
event-time range in the join condition so Spark can bound the join state:
without the range, every past row of each stream must be kept forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to the clicks that preceded it within
    ``max_delay`` — the canonical watermarked stream-stream interval join.

    Both inputs must carry ``user_id``, ``ts`` and ``value`` columns (the
    shapes produced by :func:`..streaming.landing.stream_file_landing`
    over event files filtered by type).

    State bound: the watermark + the ``p.ts`` range condition let Spark
    evict click state older than ``watermark + max_delay`` and purchase
    state older than ``watermark`` — join state is O(recent window), not
    O(stream history), which is what makes the operator viable on an
    unbounded stream at cluster scale.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return (
        c.join(
            p,
            F.expr(
                "c.user_id = p.user_id"
                " AND p.ts >= c.ts"
                f" AND p.ts <= c.ts + INTERVAL {max_delay}"
            ),
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.ts").alias("purchase_ts"),
            F.col("p.value").alias("purchase_value"),
        )
    )
