"""Corpus mixing: deterministic per-source sampling/upsampling for
training-data assembly (BASELINE.json north star — the data-mix step of
an LLM pipeline, à la The Pile / LLaMA source weights).

A mix assigns each source a rate r:
- r < 1  → downsample (keep an r-fraction of docs),
- r = 1  → keep as-is,
- r > 1  → upsample: every doc appears floor(r) times ("epochs") and one
  extra time for a (r − floor(r))-fraction of docs.

Membership hangs off a salted md5 hex prefix of the doc id — no RNG, no
state: the same doc lands in the same epochs on every engine, under any
partitioning, and across backfills (the property q38's split shares).
Replication is a per-row `explode(sequence(...))` — map-side only, no
shuffle; the output is a corpus stream ready to write or feed downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["source_mix_sample"]


def _frac_threshold_hex(frac: float) -> str:
    """4-hex-char upper bound selecting a `frac` share of uniform md5
    prefixes via plain string compare (65536 buckets — the granularity of
    the rate's fractional part)."""
    return format(max(0, min(65536, round(frac * 65536))), "04x")


def source_mix_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Apply a source-weighted mix to a corpus. Returns the input columns
    plus ``epoch`` (1-based copy index), one row per kept copy.

    All decisions are column expressions over a salted md5 of the id:
    copies = floor(rate) + (hash_prefix < frac_threshold). Rows with zero
    copies are filtered before the explode, so downsampled sources cost
    their kept fraction only. A negative rate is rejected.
    """
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"negative rate for source {s!r}: {r}")
    if default_rate < 0:
        raise ValueError(f"negative default_rate: {default_rate}")

    h4 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 4
    )

    def per_source(value_of) -> F.Column:
        expr = F.lit(value_of(default_rate))
        for s, r in sorted(rates.items()):
            expr = F.when(F.col(source_col) == s, F.lit(value_of(r))).otherwise(expr)
        return expr

    base = per_source(lambda r: int(r))
    thr = per_source(lambda r: _frac_threshold_hex(r - int(r)))
    n_copies = (base + (h4 < thr).cast("int")).alias("__n")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )
