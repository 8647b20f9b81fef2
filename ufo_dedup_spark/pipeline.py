"""End-to-end web-page near-duplicate detection & clustering pipeline.

Stages (north rule), each a declarative DataFrame job:

  pages (url, warc_ts, html, text, lang)
    -> extract      html -> text via pinned Arrow UDF (byte-identical per url)
    -> signatures   MinHash (numpy pandas UDF) + SimHash; band hashes JVM-side
    -> candidates   exact-hash ∪ LSH buckets ∪ SimHash chunks ∪ prefix blocks
                    ∪ winnowed-substring buckets — all with bounded fan-out
    -> verify       exact token Jaccard (JVM) + prefix shortcut; suffix-array
                    LCS for substring pairs
    -> pairs        (id_a, id_b, score, method) canonical, first-method-wins
    -> clusters     distributed union-find (large-star/small-star) over edges
                    with score >= cluster_threshold

Skew handling: every bucket-family generator bounds its fan-out via
pairs_within_groups (all-pairs below cap, sorted chain above — cluster
recall preserved through transitive closure). Checkpoint/resume is layered
on by sources/writers.py run_stage when a workdir is supplied.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ufo_dedup_spark.functions.extract import extract_text_udf
from ufo_dedup_spark.functions.hashing import make_minhash_udf, make_simhash_udf
from ufo_dedup_spark.operators.connected_components import connected_components
from ufo_dedup_spark.operators.exact import exact_dup_pairs
from ufo_dedup_spark.operators.minhash_lsh import (
    lsh_candidate_pairs,
    pairs_within_groups,
    simhash_candidate_pairs,
)
from ufo_dedup_spark.operators.pairs import first_wins
from ufo_dedup_spark.operators.substring import (
    substring_candidate_pairs,
    verify_substring_pairs,
)


@dataclass
class PipelineConfig:
    """Frozen shingle/signature config — the dedup contract.

    Defaults are tuned so token-edit near-dups up to ~8% edits (shingle
    Jaccard >= ~0.5 at shingle_k=3) are caught with p >= 0.996 per pair:
    42 bands x 3 rows gives hit probability 1-(1-s^3)^42 = 0.996 at s=0.5.
    False candidates from the flatter s-curve are discarded by the exact
    verification threshold, so banding generosity costs shuffle volume, not
    precision.
    """

    num_perm: int = 128
    shingle_k: int = 3
    bands: int = 42
    rows_per_band: int = 3
    seed: int = 42

    simhash_shingle_k: int = 2
    simhash_chunks: int = 4
    simhash_max_hamming: int = 3

    all_pairs_cap: int = 64
    prefix_key_chars: int = 64

    verify_threshold: float = 0.7
    cluster_threshold: float = 0.7

    substring_enabled: bool = True
    substring_gram: int = 64
    substring_window: int = 48
    substring_min_span: int = 200

    def __post_init__(self):
        assert self.bands * self.rows_per_band <= self.num_perm


METHOD_PRIORITY = {"exact": 1, "minhash_lsh": 2, "simhash": 3, "prefix": 4,
                   "substring": 5}


def prepare_documents(pages: DataFrame, use_extractor: bool = True) -> DataFrame:
    """pages -> docs(id, url, text, lang). id = xxhash64(url): deterministic
    across runs/resumes (never monotonically_increasing_id)."""
    text = extract_text_udf(F.col("html")) if use_extractor else F.col("text")
    return pages.select(
        F.xxhash64("url").alias("id"),
        "url",
        text.alias("text"),
        "lang",
    )


def prefix_candidate_pairs(
    docs: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Docs sharing their first ``prefix_key_chars`` chars (lowered/trimmed):
    the candidate generator for the reference's 0.95 starts-with band, which
    whole-document Jaccard LSH under-recalls."""
    key = F.xxhash64(
        F.substring(F.lower(F.trim(F.col("text"))), 1, cfg.prefix_key_chars)
    )
    keyed = docs.select(
        F.col("id").alias("_id"),
        key.alias("_pk"),
        F.length(F.trim("text")).alias("_len"),
    ).filter(F.col("_len") >= 20)
    return (
        pairs_within_groups(keyed, ["_pk"], "_id", cfg.all_pairs_cap)
        .select("id_a", "id_b")
        .distinct()
    )


def candidate_pairs(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Union of all candidate generators with method labels (priority order
    resolves multi-method hits downstream)."""
    minhash = make_minhash_udf(cfg.num_perm, cfg.shingle_k, cfg.seed)
    simhash = make_simhash_udf(cfg.simhash_shingle_k, cfg.seed)
    # persist: both LSH and SimHash candidate jobs consume the signatures;
    # without this the (expensive) signature UDFs would run once per consumer
    signed = docs.select(
        "id",
        minhash(F.col("text")).alias("minhash"),
        simhash(F.col("text")).alias("simhash"),
    ).persist()

    parts = [
        exact_dup_pairs(docs, "id", "text", cfg.all_pairs_cap)
        .withColumn("method", F.lit("exact")),
        lsh_candidate_pairs(
            signed, "id", "minhash", cfg.bands, cfg.rows_per_band,
            cfg.all_pairs_cap,
        ).withColumn("method", F.lit("minhash_lsh")),
        simhash_candidate_pairs(
            signed, "id", "simhash", cfg.simhash_chunks,
            cfg.simhash_max_hamming, cfg.all_pairs_cap,
        ).withColumn("method", F.lit("simhash")),
        prefix_candidate_pairs(docs, cfg).withColumn("method", F.lit("prefix")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def verify_candidate_pairs(
    cands: DataFrame, docs: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Exact verification: token Jaccard (JVM-side set arithmetic) plus the
    >=20-char prefix shortcut at 0.95. Returns canonical scored pairs."""
    texts = docs.select("id", "text")
    a = texts.select(F.col("id").alias("id_a"), F.col("text").alias("_ta"))
    b = texts.select(F.col("id").alias("id_b"), F.col("text").alias("_tb"))
    j = cands.join(a, "id_a").join(b, "id_b")

    ta = F.lower(F.trim(F.col("_ta")))
    tb = F.lower(F.trim(F.col("_tb")))
    toks_a = F.array_remove(F.array_distinct(F.split(ta, "\\s+")), "")
    toks_b = F.array_remove(F.array_distinct(F.split(tb, "\\s+")), "")
    inter = F.size(F.array_intersect(toks_a, toks_b))
    union = F.size(toks_a) + F.size(toks_b) - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    is_prefix = (
        (F.length(ta) >= 20)
        & (F.length(tb) >= 20)
        & (ta.startswith(tb) | tb.startswith(ta))
    )
    score = F.when(is_prefix, F.greatest(jac, F.lit(0.95))).otherwise(jac)

    scored = j.select(
        "id_a", "id_b", score.alias("score"), "method",
        F.lit("pending").alias("status"),
    )
    return scored.filter(F.col("score") >= cfg.verify_threshold)


def substring_pairs(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Winnow candidates -> suffix-array LCS verification -> scored pairs."""
    cands = substring_candidate_pairs(
        docs, "id", "text", cfg.substring_gram, cfg.substring_window,
        cfg.all_pairs_cap,
    )
    verified = verify_substring_pairs(
        cands, docs, "id", "text", cfg.substring_min_span
    )
    # score: span length normalized by the shorter doc
    a = docs.select(F.col("id").alias("id_a"), F.length("text").alias("_la"))
    b = docs.select(F.col("id").alias("id_b"), F.length("text").alias("_lb"))
    return (
        verified.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("lcs_len").cast("double") / F.least("_la", "_lb"), 6
            ).alias("score"),
            F.lit("substring").alias("method"),
            F.lit("pending").alias("status"),
        )
    )


def run_pipeline(
    spark,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    use_extractor: bool = True,
) -> dict[str, DataFrame]:
    """Full pipeline -> {'docs', 'pairs', 'clusters'} DataFrames.

    ``pairs``: (id_a, id_b, score, method, status), canonical, one row per
    pair (method priority: exact > minhash_lsh > simhash > prefix >
    substring). ``clusters``: (id, cluster_id) for every doc, singletons
    included with cluster_id = id.
    """
    cfg = cfg or PipelineConfig()
    docs = prepare_documents(pages, use_extractor=use_extractor).persist()

    cands = candidate_pairs(docs, cfg)
    verified = verify_candidate_pairs(cands, docs, cfg)
    all_pairs = verified
    if cfg.substring_enabled:
        all_pairs = all_pairs.unionByName(substring_pairs(docs, cfg))

    prio = F.when(F.lit(False), F.lit(0))
    for m, p in METHOD_PRIORITY.items():
        prio = prio.when(F.col("method") == m, F.lit(p))
    pairs = first_wins(
        all_pairs.withColumn("priority", prio.otherwise(F.lit(99)))
    ).persist()

    edges = pairs.filter(
        (F.col("score") >= cfg.cluster_threshold)
        | (F.col("method") == "substring")
    )
    cc = connected_components(edges.select("id_a", "id_b"))
    clusters = (
        docs.select("id", "url")
        .join(cc, on="id", how="left")
        .select(
            "id",
            "url",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
    )
    return {"docs": docs, "pairs": pairs, "clusters": clusters}
