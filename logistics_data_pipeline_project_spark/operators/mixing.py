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

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["source_mix_sample", "ticket_sample_k", "domain_cap"]


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


def ticket_sample_k(
    df: DataFrame,
    key_col: str,
    k: int,
    strata: Sequence[str] = (),
    weight_col: str | None = None,
    salt: str = "t",
) -> DataFrame:
    """Exact-k deterministic sample per stratum: (strata…, key, n_tickets,
    ticket) for the k keys with the LARGEST ticket hash — uniform when
    ``weight_col`` is None, weight-proportional when it names an INTEGER
    column. Keys whose weight is NULL or < 1 are EXCLUDED (enforced by a
    filter, not just documented): weight <= 0 means zero selection
    probability, and letting them reach the ticket explosion would grant
    them spurious tickets (see inline comment).

    This is Efraimidis–Spirakis weighted reservoir sampling (A-ES, IPL
    2006) with the float math removed: A-ES keeps the top-k by priority
    u_i^(1/w_i), and for integer w the max of w iid uniforms has exactly
    the distribution u^(1/w) — so each key draws ``w`` salted md5 tickets
    (`explode(sequence(1, w))`, map-side) and keeps its lexicographic max.
    Successive-draw inclusion probabilities are exactly weight-
    proportional without replacement, yet every comparison is a hex
    STRING compare: no u^(1/w), no ln(u)/w — which matters because libm
    `ln` disagrees between engines in the last ulp ~7% of the time
    (measured Spark-JVM vs DuckDB), and a sampler whose boundary hinges
    on a float would not survive the exact differential gate or a Spark
    minor-version libm change.

    Scale shape: ticket explosion multiplies rows by w (cap weights — a
    quality tier of 1..8, not a raw count), but the per-key max collapses
    map-side in partial aggregation, so the shuffle carries one row per
    key; the per-stratum top-k is one window over those survivors with a
    (ticket, key) tiebreak — deterministic under any partitioning. Re-
    running on re-delivered data reselects the identical sample (stable
    eval holdouts / ablation subsets across backfills)."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    w_int = (
        F.lit(1).cast("int")
        if weight_col is None
        else F.col(weight_col).cast("int")
    )
    ticket = F.md5(
        F.concat(
            F.lit(f"{salt}:"),
            F.col("__i").cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        )
    )
    per_key = (
        # A weight <= 0 means zero selection probability and a NULL weight
        # is unknowable, so both are excluded BEFORE the ticket explosion:
        # sequence(1, w) with w <= 0 would otherwise produce a DESCENDING
        # sequence ([1,0], [1,0,-1], ...) that silently grants |w|+2
        # tickets — inverting the intended weighting.
        df.filter(w_int >= 1)
        .select(
            *strata,
            key_col,
            w_int.alias("n_tickets"),
            F.explode(F.sequence(F.lit(1), w_int)).alias("__i"),
        )
        .select(*strata, key_col, "n_tickets", ticket.alias("ticket"))
        .groupBy(*strata, key_col, "n_tickets")
        .agg(F.max("ticket").alias("ticket"))
    )
    win = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(
        F.desc("ticket"), F.col(key_col)
    )
    return (
        per_key.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def domain_cap(
    df: DataFrame,
    source_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
    fanout_chars: int = 2,
) -> DataFrame:
    """Per-domain document cap (C4/RefinedWeb crawl-balance rule): each
    ``source_col`` group keeps at most ``cap`` rows, chosen by a
    deterministic salted-md5 draw (RNG-free, partitioning-stable,
    rerun-identical — the same discipline as ``source_mix_sample``).
    Output adds ``dom_rank`` (1..cap within the source, by draw order).

    Semantically identical to one ``row_number() OVER (PARTITION BY
    source ORDER BY md5(salt:id), id) <= cap`` window — which is the
    definition the q225 oracle replays — but a single per-source window
    is one reducer swallowing a whole domain, and crawl domains are NOT
    balanced (one mega-domain can be half the corpus). So the cap runs
    in two phases: a local top-``cap`` window per (source, first
    ``fanout_chars`` hex chars of the rank key) — every global winner
    also wins its own bucket, so the global top-``cap`` is provably
    inside the union of the 16^fanout_chars bucket top-``cap``s — then
    the exact window over the <= 16^fanout_chars * cap survivors per
    source.  Spark additionally pushes each cap below its exchange as a
    partial WindowGroupLimit (plan-asserted in test_catalog_plans), so
    a shuffle carries at most ``cap`` rows per (group, map partition);
    the default 256-way fan-out bounds the residual reducer sort to
    ~maps*cap rows even when one domain is half the corpus (the skewed
    fixture in test_ingest_scale_ops certifies the selection matches
    the single-window definition under exactly that skew)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    if not 1 <= fanout_chars <= 8:
        raise ValueError("fanout_chars must be in 1..8")
    d = df.withColumn(
        "__rk",
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
    )
    bucket = F.substring("__rk", 1, fanout_chars)
    w1 = Window.partitionBy(source_col, bucket).orderBy("__rk", id_col)
    pre = d.withColumn("__rn", F.row_number().over(w1)).filter(
        F.col("__rn") <= cap
    )
    w2 = Window.partitionBy(source_col).orderBy("__rk", id_col)
    return (
        pre.drop("__rn")
        .withColumn("dom_rank", F.row_number().over(w2))
        .filter(F.col("dom_rank") <= cap)
        .drop("__rk")
    )
