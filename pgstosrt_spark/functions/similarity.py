"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the exactness baseline: cross join queries x
    corpus with a broadcast of the (small) query side, dot products as
    zip_with/aggregate expressions in float64 (JVM-side, codegen).
  * IVF top-k — the scale path: deterministic centroid table (sampled
    seed rows), every vector assigned to its nearest centroid (one narrow
    pass), queries probe only the closest ``nprobe`` centroid buckets.
    At 10^12 rows this turns an O(Q x N) scan into O(Q x N/centroids x
    nprobe) with the centroid table broadcast.
  * embedding near-dup — all-pairs cosine >= threshold within the corpus,
    bucketed by IVF cell to avoid the full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk_bruteforce", "ivf_assign", "ivf_topk", "embedding_near_dup"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, neighbor_id, rank, score 4dp), self-matches excluded.

    The query side is broadcast (small); scores tie-break on neighbor id
    for determinism.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_emb")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    scored = v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("q_emb"), F.col("v_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("v_emb")))
        ).alias("score_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score_raw", 4).alias("score"))
    )


def _centroids(vectors: DataFrame, n_centroids: int, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic centroid seeds: the n lowest-id vectors (a k-means
    iteration can refine in place; seeds keep the plan fully deterministic)."""
    return (
        vectors.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col))).alias("centroid_id"),
            F.col(vec_col).alias("c_emb"),
        )
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """-> (assigned vectors with centroid_id, centroid table).

    Assignment = argmax cosine against the broadcast centroid table; one
    narrow pass over the corpus, no shuffle of the vectors themselves.
    """
    cents = _centroids(vectors, n_centroids, id_col, vec_col)
    v = vectors.select(F.col(id_col), F.col(vec_col))
    scored = v.join(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "centroid_id",
        (
            _dot(F.col(vec_col), F.col("c_emb"))
            / (_norm(F.col(vec_col)) * _norm(F.col("c_emb")))
        ).alias("c_score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("c_score").desc(), F.col("centroid_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return assigned, cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing the ``nprobe`` nearest centroid cells per query."""
    assigned, cents = ivf_assign(vectors, n_centroids, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    q_cells = q.join(F.broadcast(cents)).select(
        "query_id",
        "q_emb",
        "centroid_id",
        (
            _dot(F.col("q_emb"), F.col("c_emb"))
            / (_norm(F.col("q_emb")) * _norm(F.col("c_emb")))
        ).alias("c_score"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("c_score").desc(), F.col("centroid_id"))
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "centroid_id")
    )
    cand = probes.join(assigned, "centroid_id").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (
            _dot(F.col("q_emb"), F.col(vec_col))
            / (_norm(F.col("q_emb")) * _norm(F.col(vec_col)))
        ).alias("score_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("score_raw", 4).alias("score"))
    )


def embedding_near_dup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), IVF-bucketed.

    Pairs are only compared within a centroid cell — the standard blocking
    trick; at threshold ~0.95 true dups share a cell with near certainty.
    """
    assigned, _ = ivf_assign(vectors, n_centroids, id_col, vec_col)
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        (
            _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            / (_norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}")))
        ).alias("score_raw"),
    )
    return pairs.filter(F.col("score_raw") >= threshold).select(
        "vec_a", "vec_b", F.round("score_raw", 4).alias("cosine")
    )
