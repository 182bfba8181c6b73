"""Lexical retrieval over the document corpus: BM25 scoring / top-k and
reciprocal-rank fusion (RRF) of independent rankings.

Retrieval is a first-class training-data-pipeline operation: targeted
decontamination (find the training docs an eval question retrieves),
data selection ("pull the top-k docs for each seed query"), and hybrid
dedup triage all reduce to "score every document against a small query
set and keep the best k per query".

Engine-exactness. Textbook BM25 is float math with a log() idf — two
engines disagree in the last ulp and every downstream rank flips.  Here
the whole score is INTEGER arithmetic, exact in any engine:

- ``k1 = 6/5`` and ``b = 3/4`` (the standard 1.2 / 0.75) are kept as
  rationals and cleared of denominators.  With ``L`` = total corpus
  tokens, ``N`` = corpus docs, ``dl`` = doc length (so ``avgdl = L/N``):

      tf_sat = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
             = (22*tf*L) / (10*tf*L + 3*L + 9*dl*N)        # times 10*L/10*L

- the idf keeps Robertson's +0.5 damping but drops the monotone log()
  wrapper:  ``idf_x1000 = ((2N - 2df + 1)*1000) div (2df + 1)`` — the
  rational inside ``ln(1 + ·)`` scaled by 1000.  Per-term monotonicity
  (and therefore single-term ranking) is unchanged; multi-term sums
  weight rare terms more steeply than the log form, which is a
  deliberate, documented scoring variant — not an approximation error.

- ``term_score_x1000 = (idf_x1000 * num) div den`` then SUMs over the
  query's terms: integer floor-per-term then integer sum, associative
  and bit-identical across engines and partitionings.

Overflow headroom: ``idf_x1000 * num <= (2N*1000/3) * 22*dl_max*L``;
with BIGINT's 9.2e18 this holds through N ~ 5e5 docs per *oracle* run —
the catalog's comparison scale.  At cluster scale swap the two 1000
scale factors for DECIMAL(38,0) or rescale; the ranking logic is
unchanged.

Scale shape (100 TB): document text is tokenized once; only (doc_id,
term, tf) rows for the ~dozen query terms survive the first filter, so
the scoring join moves O(matching docs) rows, not the corpus.  Doc
lengths are one map-side-combined aggregate keyed on doc_id.  The
query-term table is a literal broadcast.  Final per-query top-k is a
window over query_id — bounded by design at |queries| partitions; for
thousand-query batches pre-cut candidates with a per-partition local
top-k first (see ranking.py notes).

Reference scope: the reference repo (Airflow/Snowflake logistics DAGs)
has no retrieval surface; this module is part of the beyond-reference
LLM-data family required by the build brief.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = [
    "bm25_parts",
    "bm25_scores",
    "bm25_topk",
    "rrf_fuse",
    "maintain_bm25_index",
    "bm25_topk_from_index",
]


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, token) pairs: lowercase, split on single spaces — the same
    tokenizer as the tf-idf keyword stage (queries/llmdata.py q055) so
    retrieval and keyword statistics agree on term identity."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")


def bm25_parts(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    share: bool = False,
) -> dict[str, DataFrame]:
    """The shared intermediate tables of a BM25 run — ``dl`` (doc
    lengths), ``qterms``, ``tf`` (per doc-term counts over query terms
    only), ``df``, and ``scores``.

    ``dl`` is always materialized (lazy localCheckpoint): the corpus
    scalars are count/sum over it, so scalar fetch + scoring share one
    tokenization.  ``share=True`` additionally materializes ``tf`` for
    multi-ranking consumers: Spark does NOT reuse logically-shared
    subtrees across branches (column pruning makes the exchanges
    differ, so no ReusedExchange), and without the barrier a hybrid
    query would pay one full corpus tokenization per ranking.  The
    checkpointed tables are the post-aggregation small ones — O(docs)
    and O(matching doc-terms) — never the exploded token stream."""
    spark: SparkSession = docs.sparkSession
    toks = _tokens(docs, id_col, text_col)

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # materialize dl BEFORE pulling the corpus scalars from it: the
    # scalars are count/sum over the O(docs) table, so the scalar job,
    # the scoring join, and any share=True consumer all ride ONE
    # corpus tokenization instead of one each
    dl = dl.localCheckpoint(eager=False)
    n_docs, n_tokens = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    ).first()
    qterms = _qterms(spark, queries)

    # Filter the token stream to query terms BEFORE any shuffle: the
    # broadcast semi-join keeps O(matching rows), never the corpus.
    tf = (
        toks.join(F.broadcast(qterms.select("token").distinct()), "token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if share:
        tf = tf.localCheckpoint(eager=False)
    df_tbl, scores = _scores_from_tables(tf, dl, qterms, n_docs, n_tokens)
    return {
        "dl": dl,
        "qterms": qterms,
        "tf": tf,
        "df": df_tbl,
        "scores": scores,
    }


def _qterms(spark: SparkSession, queries: Sequence[tuple[int, str]]) -> DataFrame:
    return spark.createDataFrame(
        sorted(
            {
                (qid, t)
                for qid, qtext in queries
                for t in qtext.lower().split()
                if t
            }
        ),
        "query_id int, token string",
    )


def _scores_from_tables(
    tf: DataFrame,
    dl: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    n_tokens: int,
) -> tuple[DataFrame, DataFrame]:
    """The scoring tail shared by the direct and the index-backed paths:
    df from the (query-term-filtered) tf table, then the integer BM25
    expression summed per (query, doc)."""
    df_tbl = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"((((2*{n_docs} - 2*df + 1) * 1000) div (2*df + 1))"
                f" * (22 * tf * {n_tokens}))"
                f" div (10 * tf * {n_tokens} + 3 * {n_tokens}"
                f"      + 9 * dl * {n_docs})"
            ).alias("term_score_x1000"),
        )
    )
    scores = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score_x1000").cast("long").alias("score_x1000")
    )
    return df_tbl, scores


def bm25_scores(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer-exact BM25: one row per (query_id, doc_id) with
    ``score_x1000`` (BIGINT) summed over the query's distinct terms.

    Only documents containing >= 1 query term appear (inner semantics —
    a no-hit doc has score 0 and is never a retrieval result).
    """
    return bm25_parts(docs, queries, id_col=id_col, text_col=text_col)[
        "scores"
    ]


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` docs per query by BM25, deterministic tie-break on
    doc_id.  The ranking window partitions on query_id — bounded
    partition count; candidates per partition are already only the
    term-matching docs."""
    scored = bm25_scores(docs, queries, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x1000"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score_x1000", "rnk")
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    k: int,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of independent per-query rankings.

    Each input carries (query_id, doc_id, rnk).  A doc's fused score is
    the integer sum of ``1_000_000 div (rrf_k + rnk)`` over the lists
    it appears in (docs missing from a list contribute 0 — standard
    RRF).  Integer floors keep the fusion bit-exact across engines.
    Returns top-``k`` per query by fused score, doc_id tie-break.
    """
    contribs = [
        r.select(
            "query_id",
            "doc_id",
            F.expr(f"1000000 div ({rrf_k} + rnk)").alias("contrib"),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("long").alias("rrf_x1e6"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_x1e6"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rnk") <= k)
        .select("query_id", "doc_id", "rrf_x1e6", "n_lists", "fused_rnk")
    )


def maintain_bm25_index(
    store,
    prefix: str,
    docs_batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold an append-only document batch into the materialized BM25
    index table ``<prefix>_tf`` (doc, token, tf — the posting grain)
    via ``plans.incremental``'s watermarked rollup: each refresh
    tokenizes ONLY the new batch and merges decomposable count partials
    into the stored snapshot — the search-index build that never
    re-reads corpus history.  The doc id is the ingestion cursor
    (append-only, monotone), riding inside the rollup snapshot so
    index + watermark commit atomically.

    The index is deliberately ONE table: doc lengths are exactly
    ``sum(tf) per doc`` and are derived from the committed snapshot at
    query time — a second independently-watermarked table could be
    caught mid-crash out of step with the postings (tf committed, dl
    not), leaving scores that match neither corpus state.  In
    production, cache the derived dl as a snapshot REBUILT from the tf
    version it was derived from (a cache, never a second source of
    truth), and bucket the tf table by token so a query batch prunes
    to its terms' buckets (operators/scale.py::write_bucketed)."""
    from ..plans.incremental import incremental_rollup

    toks = _tokens(docs_batch, id_col, text_col)
    incremental_rollup(
        store,
        f"{prefix}_tf",
        toks,
        keys=["doc_id", "token"],
        measures={"tf": ("token", "count")},
        cursor_col="doc_id",
    )


def bm25_topk_from_index(
    spark: SparkSession,
    store,
    prefix: str,
    queries: Sequence[tuple[int, str]],
    k: int,
) -> DataFrame:
    """Top-``k`` per query served FROM the maintained index — identical
    results to ``bm25_topk`` over the full corpus (asserted in tests),
    without touching any document text.  Doc lengths and corpus scalars
    derive from the same committed tf snapshot the postings come from,
    so a reader can never observe postings and lengths from different
    corpus states."""
    qterms = _qterms(spark, queries)
    tf_full = store.read(f"{prefix}_tf").select("doc_id", "token", "tf")
    tf = tf_full.join(
        F.broadcast(qterms.select("token").distinct()), "token"
    )
    dl = (
        tf_full.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .localCheckpoint(eager=False)
    )
    n_docs, n_tokens = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("l")
    ).first()
    _, scores = _scores_from_tables(tf, dl, qterms, n_docs, n_tokens)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x1000"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score_x1000", "rnk")
    )
