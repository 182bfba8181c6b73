"""Similarity search over embedding columns (BASELINE.json north star).

- **cosine_topk** — brute-force exact top-k: broadcast the (small) query
  set, score every candidate with a JVM-side fold (zip_with + aggregate —
  no Python), per-query top-k via window. At 100 TB the candidate scan is
  embarrassingly parallel; the window shuffles only (query × candidate)
  score rows, and with `k` small the dominant cost is the scan itself.
- **lsh_topk** — the approximate scale path: random-hyperplane
  (BucketedRandomProjectionLSH) pre-bucketing so each query only scores
  its bucket's candidates; fixed seed for determinism.

Determinism: dot/norm folds run left-to-right (F.aggregate is a strict
sequential fold), so scores are bit-stable; ranking orders by the rounded
score with the candidate id as tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cosine_topk", "lsh_topk"]


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, cand_id, cosine, rnk)."""
    pairs = candidates.crossJoin(F.broadcast(queries)).filter(
        F.col(cand_id) != F.col(query_id)
    )
    cos = _dot(query_vec, cand_vec) / (_norm(query_vec) * _norm(cand_vec))
    scored = pairs.withColumn("cosine", F.round(cos, round_to).cast("double"))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(cand_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, cand_id, "cosine", "rnk")
    )


def lsh_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via random-hyperplane bucketing (Spark ML
    BucketedRandomProjectionLSH over euclidean distance — equivalent
    neighbor ordering to cosine for L2-normalized vectors).

    Scale path: candidates are only scored within matching hash buckets, so
    cost is O(n · tables) hashing + bucket-local joins instead of the full
    cross product. Returns (query_id, cand_id, distance) candidates;
    rows-only correctness (approximate by design).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    # L2-normalize then hash: euclidean-NN == cosine-NN on the unit sphere.
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    unit = embeddings.select(
        F.col(id_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
        ).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(unit)
    qs = unit.filter(F.col(id_col).isin(query_ids))
    joined = model.approxSimilarityJoin(qs, unit, float("inf"), distCol="distance")
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("cand_id"))
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("query_id"),
            F.col(f"datasetB.{id_col}").alias("cand_id"),
            F.round(F.col("distance"), 6).alias("distance"),
        )
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
