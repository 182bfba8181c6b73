"""PII detection and redaction over text columns — pure column
expressions, zero Python per row.

A training-data pipeline must strip personal identifiers before text
reaches a corpus (the reference has no such stage — its PII lives safely
inside Snowflake columns — but a 100 TB web/text ingest cannot skip it).
Everything here compiles to JVM ``regexp_count`` / ``regexp_replace``
inside whole-stage codegen: the scan streams through the patterns once,
no UDF, no Arrow crossing, and the operator composes with any filter or
aggregation Catalyst wants to push around it.

Pattern dialect note: the patterns deliberately use only features with
identical semantics in Java regex (Spark) and RE2 (DuckDB — the
differential oracle): character classes, bounded repetition, alternation,
and word boundaries. No lookaround, no backreferences — RE2 has neither,
and avoiding them is also what keeps matching linear-time at scale
(Java's backtracking engine can go super-linear on adversarial text; a
crawled corpus IS adversarial input).

Redaction replaces each match with a typed token (``<EMAIL>`` …) rather
than deleting it, preserving sentence structure for downstream quality
scoring. Order matters and is fixed: emails before long digit runs
(an email's local part may contain digits), phones before bare digit
runs (a phone IS a digit run with punctuation), IPs before digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Detection patterns, applied in declaration order during redaction.
#: Keys are the redaction token names; values are Java/RE2-portable
#: regexes.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative (no quoted local parts); the +/.%-
    # class covers the overwhelming majority of real addresses
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: optional +CC, then 8-14 digits with
    # optional single space/dash/dot separators between groups
    "PHONE": r"\+?[0-9]{1,3}[-. ][0-9]{3,5}[-. ][0-9]{4,8}",
    # dotted-quad IPv4 (word-bounded so it doesn't eat version strings
    # embedded in longer dotted sequences)
    "IPV4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # bare runs of 9+ digits: account numbers, SSN-ish ids, card numbers
    # with separators already stripped
    "IDNUM": r"\b[0-9]{9,}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts for ``text`` — one ``regexp_count``
    column expression per pattern (name → Column, caller aliases)."""
    c = F.col(text) if isinstance(text, str) else text
    return {name: F.regexp_count(c, F.lit(p)) for name, p in PII_PATTERNS.items()}


def redact_pii(text: Column | str) -> Column:
    """``text`` with every PII match replaced by its ``<TYPE>`` token,
    applying the patterns in ``PII_PATTERNS`` declaration order (emails
    and phones are consumed before the bare digit-run pattern can see
    their digits)."""
    c = F.col(text) if isinstance(text, str) else text
    for name, p in PII_PATTERNS.items():
        c = F.regexp_replace(c, p, f"<{name}>")
    return c


def pii_audit(
    df: DataFrame, text_col: str, group_by: list[str] | None = None
) -> DataFrame:
    """Corpus PII audit: per ``group_by`` stratum (or globally), the
    row count, per-category total match counts, the number of rows with
    ANY match, and the total characters removed by redaction (original
    minus redacted length — negative when a token is longer than its
    match, so it is reported as a raw signed delta).

    One scan, one map-side-combined shuffle on the (small) stratum key;
    every aggregate is an integer sum, so results are exact and
    partitioning-independent at any scale."""
    counts = pii_counts(text_col)
    tagged = df.select(
        *(group_by or []),
        *[c.alias(f"__n_{k.lower()}") for k, c in counts.items()],
        (F.length(F.col(text_col)) - F.length(redact_pii(text_col))).alias(
            "__delta"
        ),
    )
    any_hit = sum(
        (F.col(f"__n_{k.lower()}") > 0).cast("int") for k in PII_PATTERNS
    )
    tagged = tagged.withColumn("__any", (any_hit > 0).cast("long"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [
        F.sum(f"__n_{k.lower()}").alias(f"n_{k.lower()}") for k in PII_PATTERNS
    ]
    aggs += [
        F.sum("__any").alias("n_rows_with_pii"),
        F.sum("__delta").alias("chars_delta"),
    ]
    if group_by:
        return tagged.groupBy(*group_by).agg(*aggs)
    return tagged.agg(*aggs)
