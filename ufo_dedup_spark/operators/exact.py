"""Exact deduplication: content-hash groupBy.

xxhash64 over the raw text is the grouping key (64-bit collisions are
acceptable for candidate generation because every pair is still verified
downstream; use md5 for the collision-free variant). Pair fan-out within a
hash group is bounded exactly like LSH buckets (pairs_within_groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ufo_dedup_spark.operators.minhash_lsh import pairs_within_groups


def exact_dup_pairs(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    all_pairs_cap: int = 64,
) -> DataFrame:
    """Distinct (id_a, id_b) pairs with byte-identical text."""
    hashed = docs.select(
        F.col(id_col).alias("_id"), F.xxhash64(text_col).alias("_h")
    )
    # hash groups are disjoint, so pairs are already unique — no distinct
    return pairs_within_groups(hashed, ["_h"], "_id", all_pairs_cap).select(
        "id_a", "id_b"
    )


def keep_first_representatives(
    docs: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: lowest id wins (deterministic)."""
    w = Window.partitionBy(F.xxhash64(text_col)).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
