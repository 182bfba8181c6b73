"""Probabilistic-sketch operators: count-min counters and Bloom-filter
membership, both built from deterministic md5 bucket hashing so every
result is reproducible across engines, partitionings, and re-runs (the
engine-wide determinism policy — see queries/registry.py).

Why these exist at 100 TB: exact per-key state (counts, membership) is
O(distinct keys); both sketches here are O(depth × 16^hex_chars) — a few
KB — and their state is *mergeable* (counters are sum-decomposable,
Bloom bit-sets are union-decomposable), so partial sketches combine
map-side exactly like any algebraic aggregate, and incremental refreshes
merge new-batch sketches into stored ones without re-reading history
(the same contract plans/incremental.py uses for HLL).

Buckets are hex-prefix strings rather than integers: ``substr(md5(
"<row>:" || key), 1, hex_chars)`` is engine-portable (Spark and DuckDB
md5 agree bit-for-bit) and needs no hex→int conversion, giving
``16^hex_chars`` buckets per hash row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(key: Column, row: int, hex_chars: int) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{row}:"), key.cast("string"))), 1, hex_chars
    )


def cms_counters(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 3,
    hex_chars: int = 2,
) -> DataFrame:
    """Count-min sketch as a DataFrame: one counter row per (hash row,
    bucket), ``counter`` = total weight of keys landing in the bucket.

    Cormode & Muthukrishnan 2005: estimate(key) = min over rows of its
    bucket's counter — never under, over only on collisions. The explode
    to ``depth`` rows happens map-side (Expand), and the single groupBy
    shuffles at most depth·16^hex_chars aggregated rows after partial
    aggregation — the fact stream itself never reshuffles.
    """
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    entries = F.array(
        *[
            F.struct(
                F.lit(r).alias("hash_row"),
                _bucket(F.col(key_col), r, hex_chars).alias("bucket"),
            )
            for r in range(1, depth + 1)
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"), w.alias("w"))
        .groupBy(F.col("e.hash_row").alias("hash_row"), F.col("e.bucket").alias("bucket"))
        .agg(F.sum("w").cast("long").alias("counter"))
    )


def cms_estimate(
    items: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 3,
    hex_chars: int = 2,
) -> DataFrame:
    """Annotate ``items`` with ``cms_est`` — the count-min estimate of
    ``key_col`` from a ``cms_counters`` sketch. The sketch is tiny by
    construction, so the join broadcasts; min-over-rows collapses the
    depth matches back to one row per item."""
    conds = [
        (F.col("c.hash_row") == r)
        & (F.col("c.bucket") == _bucket(F.col(f"i.{key_col}"), r, hex_chars))
        for r in range(1, depth + 1)
    ]
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    others = [f"i.{c}" for c in items.columns]
    return (
        items.alias("i")
        .join(F.broadcast(counters.alias("c")), cond)
        .groupBy(*others)
        .agg(F.min("c.counter").alias("cms_est"))
    )


def bloom_bits(
    df: DataFrame, key_col: str, depth: int = 3, hex_chars: int = 2
) -> DataFrame:
    """Bloom-filter bit-set as a DataFrame: the DISTINCT (hash_row,
    bucket) pairs hit by the member keys. m = depth·16^hex_chars bits;
    union of two filters = union of their rows (mergeable)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(r).alias("hash_row"),
                _bucket(F.col(key_col), r, hex_chars).alias("bucket"),
            )
            for r in range(1, depth + 1)
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"))
        .select(F.col("e.hash_row").alias("hash_row"), F.col("e.bucket").alias("bucket"))
        .distinct()
    )


def bloom_might_contain(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    depth: int = 3,
    hex_chars: int = 2,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Add ``flag_col``: True iff every hash row's bucket of ``key_col``
    is set in ``bits`` — no false negatives, false positives at the
    classic (1−e^{−kn/m})^k rate. Each per-row probe is a broadcast left
    join against a ≤16^hex_chars-row bit list, so the pass/fail decision
    happens map-side on the probe stream — the shape that lets a join
    prune its big side before any shuffle."""
    out = probe
    flags = []
    for r in range(1, depth + 1):
        row_bits = (
            bits.filter(F.col("hash_row") == r)
            .select(F.col("bucket").alias(f"_b{r}"))
        )
        out = out.join(
            F.broadcast(row_bits),
            _bucket(F.col(key_col), r, hex_chars) == F.col(f"_b{r}"),
            "left",
        )
        flags.append(F.col(f"_b{r}").isNotNull())
    cond = flags[0]
    for fl in flags[1:]:
        cond = cond & fl
    return out.withColumn(flag_col, cond).drop(
        *[f"_b{r}" for r in range(1, depth + 1)]
    )
