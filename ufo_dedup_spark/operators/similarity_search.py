"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side zip_with/aggregate dot products against
  a broadcast query vector, TakeOrderedAndProject top-k — the exactness
  baseline and the within-bucket scorer.
- IVF (inverted-file) top-k: the scale path. K centroid vectors partition the
  corpus by nearest-centroid (numpy-vectorized pandas UDF); a query probes
  only the ``n_probe`` nearest centroids' partitions, turning an O(N) scan
  into an O(N * n_probe / K) scan. Centroids here are deterministic samples
  (lowest vec_ids); a production deployment plugs k-means centroids into the
  same operator unchanged.
- embedding near-dup pairs: all-pairs cosine above a threshold, blocked by
  centroid assignment at scale (cross-partition near-dups bounded by probe
  width, same IVF tradeoff).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cs = (
        _dot(F.col("_v"), q)
        / (F.sqrt(_dot(F.col("_v"), F.col("_v"))) * F.sqrt(_dot(q, q)))
    ).alias("cos_sim")
    return (
        e.select(id_col, cs)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def make_centroid_assign_udf(centroids: np.ndarray):
    """pandas UDF: embedding -> index of nearest centroid (cosine).

    ``centroids`` (K x dim, rows unit-normalized) broadcasts with the UDF
    closure; assignment is one numpy matmul per Arrow batch.
    """
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
        return pd.Series(np.argmax(m @ c.T, axis=1).astype("int32"))

    return assign


def deterministic_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Centroids = the n_centroids lowest-id vectors (deterministic sample;
    swap for k-means in production)."""
    rows = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    return np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k: scan only the n_probe partitions
    nearest the query. With n_probe == n_centroids this is exactly
    cosine_topk (tested)."""
    if centroids is None:
        centroids = deterministic_centroids(embeddings, n_centroids, id_col, vec_col)
    assign = make_centroid_assign_udf(centroids)

    q = np.asarray(query_vec, dtype=np.float64)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qn = q / (np.linalg.norm(q) + 1e-12)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()

    bucketed = embeddings.withColumn("_c", assign(F.col(vec_col).cast("array<double>")))
    candidates = bucketed.filter(F.col("_c").isin(probe)).drop("_c")
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; brute-force pairwise).

    Correctness baseline for embedding-space dedup; at scale the same scorer
    runs within IVF buckets (block on make_centroid_assign_udf output)."""
    e = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    a = e.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cs = _dot(F.col("_va"), F.col("_vb")) / (
        F.sqrt(_dot(F.col("_va"), F.col("_va")))
        * F.sqrt(_dot(F.col("_vb"), F.col("_vb")))
    )
    return pairs.select(
        "id_a", "id_b", F.round(cs, 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)
