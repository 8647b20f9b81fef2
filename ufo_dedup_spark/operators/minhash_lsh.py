"""MinHash-LSH candidate generation: banding, bucketing, bounded pair fan-out.

Plan shape (all JVM-side except the signature UDF):
  docs --minhash_udf--> sig: array<long>
       --transform/xxhash64--> band hashes (derived in codegen, no 2nd UDF)
       --posexplode--> (id, band_idx, band_hash)
       --self-join on bucket--> candidate pairs --distinct--> verify stage

Skew control (SURVEY.md §4): bucket sizes are aggregated BEFORE pair
generation. Buckets <= ``all_pairs_cap`` emit all pairs (quadratic, bounded);
larger buckets emit a sorted chain (id_i, id_{i+1}) instead — linear in the
bucket size, and connected components later recovers the full cluster from
the chain. That keeps giant boilerplate buckets (the skewed-host case) from
exploding the shuffle while losing no cluster-level recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def band_hashes_col(sig_col: str, bands: int, rows_per_band: int):
    """array<long> of per-band hashes derived from the signature column.

    Statically unrolled (band count is config, not data) so the whole
    expression stays inside codegen.
    """
    return F.array(
        *[
            F.xxhash64(
                F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band),
                F.lit(i),
            )
            for i in range(bands)
        ]
    )


def pairs_within_groups(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    all_pairs_cap: int = 64,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) within each group, with bounded fan-out.

    Groups of size in [2, all_pairs_cap]: full within-group join.
    Larger groups: sorted adjacent chain — linear, cluster-preserving.
    Shared by exact dedup, LSH buckets, prefix blocks and winnow buckets.
    """
    extra_cols = extra_cols or []
    sizes = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_gn"))
    with_n = df.join(sizes, on=group_cols, how="inner").filter(F.col("_gn") >= 2)

    small = with_n.filter(F.col("_gn") <= all_pairs_cap).drop("_gn")
    left = small.select(
        *group_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in extra_cols],
    )
    right = small.select(
        *group_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in extra_cols],
    )
    small_pairs = left.join(right, on=group_cols, how="inner").filter(
        F.col("id_a") < F.col("id_b")
    )

    big = with_n.filter(F.col("_gn") > all_pairs_cap).drop("_gn")
    w = Window.partitionBy(*group_cols).orderBy(F.col(id_col).asc())
    chain = big.select(
        *group_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in extra_cols],
        F.lead(id_col, 1).over(w).alias("id_b"),
        *[F.lead(c, 1).over(w).alias(f"{c}_b") for c in extra_cols],
    ).filter(F.col("id_b").isNotNull())

    out_cols = (
        ["id_a", "id_b"]
        + [f"{c}_a" for c in extra_cols]
        + [f"{c}_b" for c in extra_cols]
    )
    return small_pairs.select(*out_cols).unionByName(chain.select(*out_cols))


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "id",
    sig_col: str = "minhash",
    bands: int = 32,
    rows_per_band: int = 4,
    all_pairs_cap: int = 64,
) -> DataFrame:
    """Distinct candidate pairs from MinHash LSH banding."""
    buckets = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(band_hashes_col(sig_col, bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    pairs = pairs_within_groups(
        buckets, ["band_idx", "band_hash"], "_id", all_pairs_cap
    )
    # a pair can surface in several bands — dedupe before expensive verify
    return pairs.select("id_a", "id_b").distinct()


def simhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "id",
    fp_col: str = "simhash",
    n_chunks: int = 4,
    max_hamming: int = 3,
    all_pairs_cap: int = 64,
) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit fingerprint chunks
    (pigeonhole: hamming <= n_chunks-1 guarantees one identical chunk),
    then verify Hamming distance natively via bit_count(xor).
    """
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_fp"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(fp_col), i * chunk_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    pairs = pairs_within_groups(
        chunks, ["chunk_idx", "chunk_val"], "_id", all_pairs_cap,
        extra_cols=["_fp"],
    )
    verified = pairs.filter(
        F.bit_count(F.col("_fp_a").bitwiseXOR(F.col("_fp_b"))) <= max_hamming
    )
    return verified.select("id_a", "id_b").distinct()
