"""Distributed BPE tokenizer training: learn byte-pair-encoding merge
rules from a corpus with DataFrame aggregations.

Real BPE trainers (GPT-2's, SentencePiece) operate on the WORD-FREQUENCY
table, not the raw corpus: the corpus collapses to (distinct word,
count) once, and every merge round then works on O(vocab) rows. That is
also exactly the shape that scales on Spark — the single corpus-sized
shuffle is the word count (map-side combined), after which 100 TB of
text has become a few hundred thousand weighted rows; each round is one
tiny pair-count aggregate + a one-row collect.

Determinism contract (what makes the SQL oracle replay it bit-exactly):
- round state is the word's symbol string (symbols space-joined);
  initial symbols are the word's characters;
- the round's merge pair maximizes total weight, ties broken on
  (left, right) lexicographically;
- merge application is a strict left-to-right fold over the symbol
  list: the accumulator's trailing symbol merges with the current one
  iff they equal (left, right) — so overlapping runs merge
  non-overlapping left-to-right, standard BPE semantics. The fold is
  ``F.aggregate`` here and ``list_reduce`` in DuckDB; both reduce in
  element order with the first element as the seed.

Integer weights only — no floats anywhere, so results are exact on any
engine and any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Symbol string with every left-to-right non-overlapping adjacent
    (left, right) pair fused — the BPE merge step as a strict fold."""
    merged = left + right
    la = len(left)

    def step(acc: Column, x: Column) -> Column:
        tail_is_left = (acc == F.lit(left)) | acc.endswith(" " + left)
        return (
            F.when(acc == F.lit(""), x)
            .when(
                (x == F.lit(right)) & tail_is_left,
                F.concat(
                    F.substring(acc, 1, F.length(acc) - F.lit(la)),
                    F.lit(merged),
                ),
            )
            .otherwise(F.concat(acc, F.lit(" "), x))
        )

    return F.aggregate(F.split(sym_col, " "), F.lit(""), step)


def char_symbols(word: Column | str) -> Column:
    """Initial BPE state: the word's characters, space-joined (identical
    construction to the oracle's substr transform)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.substring(w, i, F.lit(1)),
        ),
        " ",
    )


def bpe_learn(
    df: DataFrame, text_col: str, rounds: int = 8
) -> tuple[list[dict], DataFrame]:
    """Learn ``rounds`` BPE merge rules from the corpus.

    Returns ``(merges, words)``: merges = [{rnd, left, right, merged,
    pair_weight}] in learning order; words = the final (word, w, sym)
    frequency table with all merges applied — the state a tokenizer
    would be built from.

    Scale shape: ONE corpus-sized shuffle (the word count); every round
    after that aggregates O(vocab) weighted rows and collects exactly
    one row (the argmax pair). The symbol-fold recompute per round is a
    narrow projection — no checkpoint needed at O(vocab)."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .select("word", "w", char_symbols("word").alias("sym"))
    )
    # O(vocab) rows from here on: materialize once so each round's pair
    # scan does not re-read and re-count the corpus
    words = words.localCheckpoint(eager=False)
    merges: list[dict] = []
    for rnd in range(1, rounds + 1):
        pairs = (
            words.select(
                "w", F.split("sym", " ").alias("s")
            )
            # single-symbol words carry no pairs (and Spark's sequence()
            # DESCENDS when start > stop, which would fabricate a NULL
            # pair from sequence(1, 0) — DuckDB's generate_series is
            # empty there; the filter keeps both engines aligned)
            .filter(F.size("s") >= 2)
            .select(
                "w",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(s[i-1] AS l, s[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("w").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        top = pairs[0]
        merges.append(
            {
                "rnd": rnd,
                "left": top["l"],
                "right": top["r"],
                "merged": top["l"] + top["r"],
                "pair_weight": int(top["c"]),
            }
        )
        words = words.withColumn(
            "sym", _apply_merge(F.col("sym"), top["l"], top["r"])
        )
        # Re-materialize after every merge (lazy — the next round's pair
        # aggregate, or the caller's first action, triggers it).  Without
        # this, round r's plan stacks r nested F.aggregate folds: total
        # fold work grows O(rounds²) and each round re-plans + re-codegens
        # a deeper expression tree — measured as wall >> task CPU on the
        # bench (driver-bound).  With it every round evaluates exactly ONE
        # fold over the O(vocab) table and plans stay constant-depth
        # (optimization guide §3.3/§7.3: truncate long lineages).
        words = words.localCheckpoint(eager=False)
    return merges, words
