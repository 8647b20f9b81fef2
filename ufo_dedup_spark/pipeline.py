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

import atexit
import os
import shutil
import tempfile
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ufo_dedup_spark.functions.extract import extract_text_udf
from ufo_dedup_spark.functions.hashing import make_minhash_udf, make_simhash_udf
from ufo_dedup_spark.operators.connected_components import connected_components
from ufo_dedup_spark.operators.minhash_lsh import (
    band_hashes_col,
    pairs_within_groups,
)
from ufo_dedup_spark.operators.pairs import first_wins_by_priority
from ufo_dedup_spark.operators.substring import (
    substring_candidate_pairs,
    verify_substring_pairs,
)

# The prefix band's minimum doc length AND its bucket-key length — a single
# constant because the two must be equal: the verification rule fires for any
# >=PREFIX_MIN_CHARS-char doc that is a prefix of a longer one, so a bucket
# key longer than the minimum would hash a minimum-to-(key-1)-char doc
# against a different (shorter) string than its superstring's first-K chars
# and the true pair would never co-bucket. PipelineConfig validates
# prefix_key_chars == PREFIX_MIN_CHARS at construction.
PREFIX_MIN_CHARS = 20

# Bumped whenever stage SEMANTICS or an inter-stage schema changes without
# any PipelineConfig field changing (mirrors SIGNATURE_VERSION for the hash
# kernels). Part of the checkpoint config fingerprint: a workdir written by
# a different logic version must not resume — e.g. the round-5 change that
# derives starts-with eligibility from prepare_tokens._pk (candidates no
# longer carry _pfx; doc_tokens gained a column) would otherwise silently
# mix old-rule and new-rule verified buckets in one output.
#   2: _pk-based starts-with eligibility; candidates schema lost _pfx,
#      doc_tokens schema gained _pk (round 5)
#   3: starts-with pairs score EXACTLY 0.95 (reference dedup.py:108-117
#      early-returns 0.95 before Jaccard; previously greatest(jaccard,
#      0.95)) and the starts-with check is fused into the main verify
#      join — pair membership identical, scores above 0.95 change
#      (round 6)
PIPELINE_LOGIC_VERSION = 3


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
    # MUST equal PREFIX_MIN_CHARS (validated in __post_init__): a longer key
    # misses 20-to-(key-1)-char prefix pairs entirely.
    prefix_key_chars: int = PREFIX_MIN_CHARS
    # each doc keeps at most this many candidate partners (smallest ids
    # win, deterministic): bounds total verification work at K*n even when
    # a boilerplate cluster surfaces O(bands * cluster_size) candidates.
    # Connectivity survives: every doc keeps its lowest-id partners, so
    # edges always lead toward cluster minima.
    max_candidates_per_doc: int = 8

    verify_threshold: float = 0.7
    cluster_threshold: float = 0.7

    substring_enabled: bool = True
    substring_gram: int = 64
    # winnowing guarantee: two docs sharing a span >= gram + window - 1
    # bytes share >= 1 fingerprint. The window is sized so that boundary
    # EQUALS min_span (64 + 137 - 1 = 200): any wider misses true spans;
    # any narrower (the old 48 guaranteed 111) fingerprints ~2.8x denser
    # only to surface sub-threshold candidates that LCS verification then
    # discards — pure shuffle/agg cost. __post_init__ enforces the bound.
    substring_window: int = 137
    substring_min_span: int = 200

    # Storage for the corpus-sized stage barriers (docs / signatures /
    # tokens / winnow fingerprints). 'memory' = Spark's default
    # deserialized MEMORY_AND_DISK; 'disk' = serialized DISK_ONLY; 'auto'
    # picks disk at or above ``barrier_disk_threshold_rows`` docs (from the
    # caller's n_docs_hint, else one cheap count of the materialized docs
    # barrier). Rationale: deserialized JVM residency of docs + token
    # arrays + signatures is ~5x their serialized size, and above ~1.5M
    # docs the barriers evict/thrash one another in a single local heap
    # (docs_extract measured 3.7 -> 47.7 s going 1M -> 2M). A real cluster
    # spreads them over executors — and the checkpointed pipeline's parquet
    # barriers never had the problem — so this only changes single-process
    # behavior at scale. Small runs keep the faster in-memory barriers.
    barrier_storage: str = "auto"
    barrier_disk_threshold_rows: int = 1_500_000

    # HOW stage barriers are served. 'blocks' = localCheckpoint (RDD
    # blocks, DISK_ONLY above the row threshold, fetched through the
    # block manager); 'parquet' = write the barrier as parquet splits in
    # a temp dir and read it back; 'auto' = parquet ONLY when executors
    # are separate JVMs (local-cluster / a real cluster master), blocks
    # otherwise — including single-JVM disk barriers. Rationale, both
    # directions measured at 4M docs: RDD disk blocks live on the
    # executor that computed them, so in multi-executor runs every OTHER
    # executor re-reads the corpus through one spindle + loopback block
    # fetches (docs_extract 33 -> 468 s going 1 -> 4 JVMs; parquet splits
    # read per-executor with OS page-cache help cut it to 91 s and lifted
    # 1->4-JVM efficiency 0.303 -> 0.39, SCALING_r06). But in a SINGLE
    # JVM the block manager is a local read and parquet only adds
    # encode/decode plus split-bound read parallelism: serving the same
    # 4M-doc barriers as parquet cost ~1.8x whole-run wall vs DISK_ONLY
    # blocks at local[32] (1299 vs ~709 s; signatures branch 603 vs
    # ~220 s), so disk storage alone must NOT trigger parquet.
    barrier_format: str = "auto"

    # Parquet-barrier (multi-JVM) runs write the doc_tokens barrier as a
    # BUCKETED+sorted table on id so both verify joins read it
    # co-partitioned (no per-side exchange/sort of the token payload
    # across executor JVMs). False = plain parquet splits; kept as a
    # switch for the measured-both-ways A/B (scripts/verify_prune_ab.py /
    # BENCH.md) like barrier_format. No effect on block-barrier
    # (single-JVM) runs.
    tokens_barrier_bucketed: bool = True

    # Left-semi-prune the verify sides to ids that actually appear in the
    # candidate table before joining token payloads. On a SPARSE-duplicate
    # corpus (few candidate-touched docs) this bounds the verify exchanges
    # by the candidate-touched set instead of the corpus; on a dense
    # corpus (the synthetic bench, where most docs are candidates) the
    # prune's own exchange of the token table is pure overhead. Default
    # off; measured both ways by scripts/verify_prune_ab.py. Output is
    # identical either way (inner joins are unchanged by pruning
    # non-matching build rows).
    verify_prune_sides: bool = False

    # Driver-round cap for the CHEAP pre-substring clustering only. That
    # CC exists solely to prune already-connected substring candidates
    # before the expensive LCS stage, and a capped (partially converged)
    # run yields a FINER partition whose labels are still sound — equal
    # labels imply genuinely connected — so capping can only prune less,
    # never wrongly (see connected_components docstring). The FINAL
    # clustering always runs to convergence. Star-shaped candidate
    # families (pairs_within_groups emits stars over minima) converge in
    # ~3 rounds; the cap only bites pathological long-diameter tails.
    cheap_cc_max_iter: int = 8

    def __post_init__(self):
        assert self.bands * self.rows_per_band <= self.num_perm
        if (
            self.substring_gram + self.substring_window - 1
            > self.substring_min_span
        ):
            raise ValueError(
                f"substring_gram + substring_window - 1 "
                f"({self.substring_gram + self.substring_window - 1}) must "
                f"not exceed substring_min_span ({self.substring_min_span}): "
                f"the winnowing guarantee only covers shared spans >= "
                f"gram + window - 1, so a wider window can miss true "
                f">= min_span spans"
            )
        if self.barrier_storage not in ("auto", "memory", "disk"):
            raise ValueError(
                f"barrier_storage must be 'auto', 'memory' or 'disk' "
                f"(got {self.barrier_storage!r})"
            )
        if self.barrier_format not in ("auto", "blocks", "parquet"):
            raise ValueError(
                f"barrier_format must be 'auto', 'blocks' or 'parquet' "
                f"(got {self.barrier_format!r})"
            )
        if self.prefix_key_chars != PREFIX_MIN_CHARS:
            raise ValueError(
                f"prefix_key_chars must equal PREFIX_MIN_CHARS "
                f"({PREFIX_MIN_CHARS}): the prefix band's bucket key and its "
                f"min-length verification gate must match or prefix pairs "
                f"straddling the key length never co-bucket (got "
                f"{self.prefix_key_chars})"
            )


METHOD_PRIORITY = {"exact": 1, "minhash_lsh": 2, "simhash": 3, "prefix": 4,
                   "substring": 5}


def make_parquet_barrier(spark) -> Callable[[DataFrame, str], DataFrame]:
    """Stage-barrier function that serves a DataFrame as parquet SPLITS.

    Writes the frame to a fresh subdirectory of a per-call temp dir and
    reads it back: the write is the eager materialization (same role as
    ``localCheckpoint(eager=True)``) and the read-back is an ordinary
    parquet scan, so every consumer — including executors in OTHER JVMs —
    reads its own splits with OS page-cache help instead of fetching RDD
    blocks from the one executor that computed them. The temp dir is
    created lazily on first use and removed at interpreter exit (the
    returned DataFrames reference the files for the session's lifetime,
    so earlier cleanup would invalidate them).

    ``bucket_by``: optional column name — the barrier is then written as a
    BUCKETED (and per-bucket sorted) table instead of plain splits, so
    downstream equi-joins on that column read the barrier already
    partitioned: no exchange and no sort of the barrier side per join.
    This is the multi-JVM verify fix — the token table was re-exchanged by
    id twice (once per pair side) in every verify, and on separate-JVM
    executors those exchanges are real network/disk traffic. Bucketed
    parquet requires a catalog table (path-only parquet loses the bucket
    spec), so the frame is registered under a per-run temp name pointing
    at the same temp dir; the bucket count follows the session's shuffle
    partitioning so join co-partitioning lines up.
    """
    state: dict = {"dir": None, "seq": 0}

    def barrier(
        df: DataFrame, name: str = "stage", bucket_by: str | None = None
    ) -> DataFrame:
        if state["dir"] is None:
            state["dir"] = tempfile.mkdtemp(prefix="ufo_dedup_barriers_")
            atexit.register(shutil.rmtree, state["dir"], ignore_errors=True)
        state["seq"] += 1
        path = os.path.join(state["dir"], f"{state['seq']:02d}_{name}")
        if bucket_by is None:
            df.write.parquet(path)
            return spark.read.parquet(path)
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        tbl = f"ufo_dedup_barrier_{name}_{uuid.uuid4().hex[:10]}"
        # repartition to the bucket layout first so each write task holds
        # exactly one bucket's rows (one file per bucket; the read side
        # then gets per-bucket sorted splits and plans no sort either)
        (
            df.repartition(n, bucket_by)
            .write.bucketBy(n, bucket_by)
            .sortBy(bucket_by)
            .option("path", path)
            .saveAsTable(tbl)
        )
        return spark.table(tbl)

    return barrier


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
    whole-document Jaccard LSH under-recalls.

    The key length equals the band's 20-char minimum: the verification rule
    fires for any >=20-char doc that is a prefix of a longer one, so a key
    longer than 20 chars would hash a 20-63-char doc against a different
    (shorter) string than its superstring's first-K chars and the true pair
    would never share a bucket. Keying at exactly the minimum guarantees
    every verifiable prefix pair collides; the coarser buckets this creates
    are bounded by pairs_within_groups' star cap.
    """
    key = F.xxhash64(
        F.substring(F.lower(F.trim(F.col("text"))), 1, cfg.prefix_key_chars)
    )
    keyed = docs.select(
        F.col("id").alias("_id"),
        key.alias("_pk"),
        F.length(F.trim("text")).alias("_len"),
    ).filter(F.col("_len") >= PREFIX_MIN_CHARS)
    # one prefix key per doc -> pair uniqueness is structural, no distinct
    return pairs_within_groups(keyed, ["_pk"], "_id", cfg.all_pairs_cap).select(
        "id_a", "id_b"
    )


def candidate_pairs(
    docs: DataFrame,
    cfg: PipelineConfig,
    barrier_level: StorageLevel | None = None,
    barrier: Callable[[DataFrame, str], DataFrame] | None = None,
) -> DataFrame:
    """Union of all candidate generators with method labels (priority order
    resolves multi-method hits downstream).

    ``barrier``: optional materialization function (run_pipeline passes
    make_parquet_barrier for disk / multi-executor runs); when absent the
    signatures barrier is a localCheckpoint at ``barrier_level``."""
    minhash = make_minhash_udf(cfg.num_perm, cfg.shingle_k, cfg.seed)
    simhash = make_simhash_udf(cfg.simhash_shingle_k, cfg.seed)
    # EAGER barrier: both LSH and SimHash branches consume the signatures
    # inside one downstream job. A lazy persist() does not protect against
    # concurrent first-consumers (each sees a cache miss and recomputes the
    # UDFs), so materialize here. On a cluster this barrier is the
    # signatures checkpoint write (sources/writers.py).
    signed = docs.select(
        "id",
        minhash(F.col("text")).alias("minhash"),
        simhash(F.col("text")).alias("simhash"),
    )
    signed = (
        barrier(signed, "signatures")
        if barrier is not None
        else signed.localCheckpoint(eager=True, storageLevel=barrier_level)
    )

    # FUSED bucket families (guide §2.4 "remove shuffles outright"): all
    # four candidate generators are "pairs within groups" over DISJOINT
    # key spaces, so instead of four pairs_within_groups calls — each
    # paying its own count-agg exchange and collect-agg exchange (8
    # exchanges) — the keyed rows are unioned under a family tag and ONE
    # call does the bucket-size pre-agg, member semi-join and member
    # collection for every family at once (2 exchanges). Family tag =
    # METHOD_PRIORITY value, so the tag IS the method priority and the
    # per-pair method resolution below is a plain min(int) — hash-
    # aggregable with map-side partial aggregation (min_by over the method
    # STRING forced a SortAggregate, fully sorting the candidate union
    # twice). Per-family semantics are unchanged: group keys are disjoint
    # (the tag is part of the key), the per-group star cap applies exactly
    # as before, and the SimHash Hamming verify runs on the family's pairs
    # via the carried fingerprint (NULL for other families).
    null_fp = F.lit(None).cast("long")
    exact_rows = docs.select(
        F.col("id").alias("_id"),
        F.lit(METHOD_PRIORITY["exact"]).alias("_fam"),
        F.lit(0).alias("_k1"),
        F.xxhash64("text").alias("_k2"),
        null_fp.alias("_fp"),
    )
    lsh_rows = (
        signed.filter(F.col("minhash").isNotNull())
        .select(
            F.col("id").alias("_id"),
            F.posexplode(
                band_hashes_col("minhash", cfg.bands, cfg.rows_per_band)
            ).alias("_k1", "_k2"),
        )
        .select(
            "_id",
            F.lit(METHOD_PRIORITY["minhash_lsh"]).alias("_fam"),
            "_k1",
            "_k2",
            null_fp.alias("_fp"),
        )
    )
    chunk_bits = 64 // cfg.simhash_chunks
    chunk_mask = (1 << chunk_bits) - 1
    sim_rows = (
        signed.filter(F.col("simhash").isNotNull())
        .select(
            F.col("id").alias("_id"),
            F.col("simhash").alias("_fp"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(
                            F.col("simhash"), i * chunk_bits
                        ).bitwiseAND(F.lit(chunk_mask))
                        for i in range(cfg.simhash_chunks)
                    ]
                )
            ).alias("_k1", "_k2"),
        )
        .select(
            "_id",
            F.lit(METHOD_PRIORITY["simhash"]).alias("_fam"),
            "_k1",
            "_k2",
            "_fp",
        )
    )
    lt = F.lower(F.trim(F.col("text")))
    pfx_rows = (
        docs.filter(F.length(F.trim("text")) >= PREFIX_MIN_CHARS)
        .select(
            F.col("id").alias("_id"),
            F.lit(METHOD_PRIORITY["prefix"]).alias("_fam"),
            F.lit(0).alias("_k1"),
            F.xxhash64(F.substring(lt, 1, cfg.prefix_key_chars)).alias("_k2"),
            null_fp.alias("_fp"),
        )
    )
    keyed = (
        exact_rows.unionByName(lsh_rows)
        .unionByName(sim_rows)
        .unionByName(pfx_rows)
    )
    fused = pairs_within_groups(
        keyed,
        ["_fam", "_k1", "_k2"],
        "_id",
        cfg.all_pairs_cap,
        extra_cols=["_fp"],
        keep_group_cols=True,
    )
    out = fused.filter(
        (F.col("_fam") != F.lit(METHOD_PRIORITY["simhash"]))
        | (
            F.bit_count(F.col("_fp_a").bitwiseXOR(F.col("_fp_b")))
            <= cfg.simhash_max_hamming
        )
    ).select("id_a", "id_b", F.col("_fam").alias("_p"))

    # resolve multi-method duplicates (best priority wins), then cap the
    # per-doc candidate fan-in.
    # No prefix flag is threaded through: starts-with eligibility is
    # re-derived in verify_candidate_pairs from the per-doc prefix key
    # (prepare_tokens._pk), so EVERY candidate pair whose texts share a
    # 20-char prefix gets the 0.95 rule — matching the reference, which
    # applies the shortcut inside compute_similarity for every pair in
    # every tier (reference dedup.py:110-116), not only pairs the prefix
    # band happened to surface.
    decode = F.when(F.lit(False), F.lit(""))
    for m, p in METHOD_PRIORITY.items():
        decode = decode.when(F.col("_p") == p, F.lit(m))
    out = (
        out.groupBy("id_a", "id_b")
        .agg(F.min("_p").alias("_p"))
        .select("id_a", "id_b", decode.alias("method"))
    )
    # Per-doc fan-in cap, applied on BOTH sides of the pair: an edge survives
    # if it is within either endpoint's K nearest (smallest-id) partners.
    # A one-sided cap (keep K smallest id_a per id_b) can disconnect a doc
    # entirely — a doc that is the smaller id in all of its candidate pairs
    # has every edge pruned by partners that each already hold K smaller-id
    # candidates. The union keep guarantees every doc with >=1 candidate
    # retains >=1 edge, so cluster connectivity survives the cap.
    w_b = Window.partitionBy("id_b").orderBy(F.col("id_a").asc())
    w_a = Window.partitionBy("id_a").orderBy(F.col("id_b").asc())
    return (
        out.withColumn("_rb", F.row_number().over(w_b))
        .withColumn("_ra", F.row_number().over(w_a))
        .filter(
            (F.col("_rb") <= cfg.max_candidates_per_doc)
            | (F.col("_ra") <= cfg.max_candidates_per_doc)
        )
        .drop("_rb", "_ra")
    )


def prepare_tokens(docs: DataFrame) -> DataFrame:
    """Per-doc verification inputs: distinct xxhash64 token set, its count,
    and the 20-char prefix key ``_pk`` (NULL for docs shorter than the
    prefix band's minimum). Computed once per corpus, reused by every
    verification bucket.

    Deliberately does NOT carry the lowered text: the verify join ships
    this table's payload through two exchanges per candidate pair, and the
    only consumer of full text — the starts-with rule — needs it ONLY for
    docs in a multi-member prefix family, which verify_candidate_pairs
    left-joins onto the PAIR rows from the (tiny) family table after the
    token joins."""
    # no array_sort: array_intersect is hash-set based, so ordering buys
    # nothing downstream and the per-doc O(n log n) comparator pass was
    # ~1/3 of this stage's JVM time; array_distinct alone is O(n)
    lt = F.lower(F.trim(F.col("text")))
    return docs.select(
        "id",
        F.array_distinct(
            F.transform(
                F.array_remove(F.split(lt, "\\s+"), ""),
                lambda t: F.xxhash64(t),
            )
        ).alias("_tok"),
        # prefix key: 8 bytes per doc riding the existing exchanges. NULL
        # (not a sentinel) below the length gate so NULL-safe-equality is
        # never needed — a NULL key can't equal anything.
        F.when(
            F.length(lt) >= PREFIX_MIN_CHARS,
            F.xxhash64(F.substring(lt, 1, PREFIX_MIN_CHARS)),
        ).alias("_pk"),
    ).withColumn("_n", F.size("_tok"))


def verify_candidate_pairs(
    cands: DataFrame,
    docs: DataFrame,
    cfg: PipelineConfig,
    prepped: DataFrame | None = None,
    filtered: bool = True,
) -> DataFrame:
    """Exact verification: token Jaccard for every candidate, plus the
    reference's >=20-char starts-with rule — applied to EVERY candidate
    pair whose texts share a 20-char prefix, whichever band surfaced the
    pair. A starts-with hit scores EXACTLY 0.95: reference dedup.py:108-117
    early-returns 0.95 before computing Jaccard, so even byte-identical
    >=20-char texts score 0.95, not 1.0 (pair membership is unaffected —
    0.95 clears every threshold a higher Jaccard would). Returns canonical
    scored pairs.

    Cost discipline, per-pair: tokenization happens ONCE PER DOC, not once
    per pair — each doc is pre-reduced to an array of xxhash64 token
    hashes plus its distinct-token count, so the per-pair work is a single
    long-array intersect and arithmetic (measured ~10x cheaper than
    per-pair string tokenization at 70k candidates). 64-bit token-hash
    collisions perturb Jaccard by < 1e-4 — far below the threshold.

    Cost discipline, per-byte: the starts-with family — docs whose 20-char
    prefix key is shared by >= 2 docs — is computed from an 8-byte groupBy
    over the token table and left-semi-prunes the text table down to
    family members; ONLY their lowered text exists downstream (the
    LeftSemi bound holds with AQE off — it does not rely on the optimizer
    broadcasting anything). The family texts are left-joined onto the PAIR
    rows after the token joins, so the token-payload exchanges never carry
    text and the family subtree is planned once per pair side rather than
    once per (larger) doc side. Eligibility per pair is a prefix-key
    equi-check evaluated INLINE (prefix-of implies equal first-20-chars,
    so _pk equality is a necessary condition, and both endpoints of an
    eligible pair are family members by construction — their texts are
    present on the joined row). Versus the round-5 shape this also deletes
    two extra exchanges of the candidate table (the separate eligibility
    joins), the distinct over family ids, and a full pair-keyed exchange
    of the scored table (the pfx join-back).
    """
    if prepped is None:
        prepped = prepare_tokens(docs).localCheckpoint(eager=True)

    # starts-with family: prefix keys shared by >= 2 docs (8-byte groupBy,
    # map-side combinable), then the family members' lowered texts. Tiny
    # for web corpora, so the left joins below broadcast under AQE; with
    # AQE off the exchange is still family-bounded.
    fam_keys = (
        prepped.filter(F.col("_pk").isNotNull())
        .groupBy("_pk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_pk")
    )
    fam_ids = (
        prepped.select("id", "_pk").join(fam_keys, "_pk", "left_semi")
        .select("id")
    )
    fam_text = docs.join(fam_ids, "id", "left_semi").select(
        "id", F.lower(F.trim(F.col("text"))).alias("_t")
    )
    # per-doc verification sides: token set + count + prefix key. The
    # family TEXT is deliberately NOT joined onto the sides: the sides
    # cross the pair-join exchanges once per doc with the token payload,
    # and attaching _t here would (a) ship family text through those
    # exchanges and (b) build the whole fam_keys/fam_ids/fam_text subtree
    # once under EACH side (the planner does not dedupe it). Instead the
    # tiny fam_text table is left-joined onto the PAIR rows after the
    # token joins — same rows and scores (the old per-side left join
    # produced exactly fam_text._t for members, NULL otherwise), the text
    # bound stays family-sized, and the subtree is planned once per pair
    # side instead of once per doc side.
    side = prepped
    if cfg.verify_prune_sides:
        # candidate-touched prune (sparse-duplicate corpora): ship 8-byte
        # ids once so the token payload is only exchanged for docs that
        # appear in >= 1 candidate pair. Inner-join semantics make this a
        # no-op on the output.
        touched = cands.select(F.col("id_a").alias("id")).unionByName(
            cands.select(F.col("id_b").alias("id"))
        )
        side = prepped.join(touched, "id", "left_semi")
    a = side.select(
        F.col("id").alias("id_a"),
        F.col("_tok").alias("_tok_a"), F.col("_n").alias("_na"),
        F.col("_pk").alias("_pka"),
    )
    b = side.select(
        F.col("id").alias("id_b"),
        F.col("_tok").alias("_tok_b"), F.col("_n").alias("_nb"),
        F.col("_pk").alias("_pkb"),
    )
    fam_a = fam_text.select(
        F.col("id").alias("id_a"), F.col("_t").alias("_ta")
    )
    fam_b = fam_text.select(
        F.col("id").alias("id_b"), F.col("_t").alias("_tb")
    )
    inter = F.size(F.array_intersect(F.col("_tok_a"), F.col("_tok_b")))
    union = F.col("_na") + F.col("_nb") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    # Jaccard is computed AT the token join and the token arrays are
    # dropped in the same projection, BEFORE the family-text joins: when
    # the family is too large to broadcast (a giant boilerplate host),
    # those joins exchange the pair table — narrowing it first means the
    # exchanges carry ~40-byte pair rows instead of both token arrays
    # (which at 8M docs / 11M pairs is tens of GB of array payload through
    # two extra exchanges, enough to OOM a single-box heap).
    jscored = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", "method",
            jac.alias("_jac"), "_pka", "_pkb",
        )
    )
    j = jscored.join(fam_a, "id_a", "left").join(fam_b, "id_b", "left")

    # eligible (non-NULL equal prefix keys) implies both texts are >=20
    # chars AND family members, so _ta/_tb are non-NULL where it matters
    elig = F.col("_pka").isNotNull() & (F.col("_pka") == F.col("_pkb"))
    is_prefix = elig & (
        F.col("_ta").startswith(F.col("_tb"))
        | F.col("_tb").startswith(F.col("_ta"))
    )
    score = F.when(is_prefix, F.lit(0.95)).otherwise(F.col("_jac"))

    scored = j.select(
        "id_a", "id_b", score.alias("score"), "method",
        F.lit("pending").alias("status"),
    )
    if not filtered:
        # ``filtered=False`` exists because filtering on the just-computed
        # score column makes Catalyst push the predicate BELOW the scoring
        # projection, substituting the full score expression into the
        # filter — the array_intersect and the starts-with comparison then
        # run TWICE per surviving row (measured ~2x the scoring cost at
        # 20k docs; almost every candidate survives, so the filter saves
        # nothing). Callers that materialize the scored table anyway
        # (run_pipeline's verify checkpoint) apply the threshold on the
        # MATERIALIZED column instead — identical rows downstream, score
        # computed once.
        return scored
    return scored.filter(F.col("score") >= cfg.verify_threshold)


def substring_pairs(
    docs: DataFrame,
    cfg: PipelineConfig,
    exclude: DataFrame | None = None,
    exclude_clusters: DataFrame | None = None,
    cands: DataFrame | None = None,
) -> DataFrame:
    """Winnow candidates -> exact-LCS verification -> scored pairs.

    ``exclude``: pairs already verified by cheaper methods (near-dups share
    winnow fingerprints trivially) and ``exclude_clusters``: (id, cluster_id)
    from clustering those cheap pairs — both pruned away BEFORE the
    expensive LCS UDF so it only sees genuinely new cross-cluster pairs.
    ``cands``: precomputed winnow candidates (run_pipeline materializes them
    concurrently with the MinHash/verify branch).
    """
    if cands is None:
        cands = substring_candidate_pairs(
            docs, "id", "text", cfg.substring_gram, cfg.substring_window,
            cfg.all_pairs_cap,
        )
    if exclude is not None:
        cands = cands.join(
            exclude.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        )
    if exclude_clusters is not None:
        # drop candidates already connected by cheaper methods: a giant
        # boilerplate cluster shares winnow fingerprints massively, and
        # running exact-substring verification inside an already-formed
        # cluster buys nothing
        ca = exclude_clusters.select(
            F.col("id").alias("id_a"), F.col("cluster_id").alias("_ca")
        )
        cb = exclude_clusters.select(
            F.col("id").alias("id_b"), F.col("cluster_id").alias("_cb")
        )
        cands = (
            cands.join(ca, "id_a", "left")
            .join(cb, "id_b", "left")
            .filter(
                F.col("_ca").isNull()
                | F.col("_cb").isNull()
                | (F.col("_ca") != F.col("_cb"))
            )
            .select("id_a", "id_b")
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
    timings: dict | None = None,
    n_docs_hint: int | None = None,
) -> dict[str, DataFrame]:
    """Full pipeline -> {'docs', 'pairs', 'clusters'} DataFrames.

    ``pairs``: (id_a, id_b, score, method, status), canonical, one row per
    pair (method priority: exact > minhash_lsh > simhash > prefix >
    substring). ``clusters``: (id, cluster_id) for every doc, singletons
    included with cluster_id = id.

    ``timings``: optional dict populated with per-barrier wall-clock
    seconds (docs_extract, the three concurrent branch durations, verify,
    cheap_cc). Branches overlap, so their durations sum to more than the
    wall they occupy; the stages after cheap_cc are lazy and land in the
    caller's first action (run_pipeline.py times those separately).

    ``n_docs_hint``: approximate corpus size, used only to pick barrier
    storage up front under barrier_storage='auto' (the docs barrier itself
    can then go to disk); without it, auto decides after counting the
    materialized docs barrier.
    """
    cfg = cfg or PipelineConfig()

    def _want_disk(n: int | None) -> bool | None:
        if cfg.barrier_storage == "disk":
            return True
        if cfg.barrier_storage == "memory":
            return False
        return None if n is None else n >= cfg.barrier_disk_threshold_rows

    def _use_parquet(disk_flag: bool | None) -> bool:
        if cfg.barrier_format == "parquet":
            return True
        if cfg.barrier_format == "blocks":
            return False
        # auto: parquet ONLY when executors are separate JVMs — RDD disk
        # blocks are single-executor-resident and every other executor
        # would fetch them through the block manager (see
        # make_parquet_barrier). In a single JVM (local[K]) the block
        # manager read is local and parquet measurably loses (4M local[32]
        # wall ~1.8x, see PipelineConfig.barrier_format), so disk storage
        # alone does not trigger parquet.
        del disk_flag  # storage level no longer affects the format choice
        master = spark.sparkContext.master or ""
        single_jvm = master == "local" or (
            master.startswith("local[") and not
            master.startswith("local-cluster")
        )
        return not single_jvm

    def _mark(key: str, t0: float) -> None:
        if timings is not None:
            timings[key] = round(time.time() - t0, 2)

    _t = time.time()
    # EAGER stage barriers: every stage below fans out to multiple
    # consumers that run concurrently inside one job — lazy persist would
    # let each branch recompute the full upstream (measured 3x wall-clock
    # at 20k docs). Small in-memory runs use localCheckpoint; disk /
    # multi-executor runs serve barriers as parquet splits. On a real
    # cluster these barriers are the per-stage checkpoint writes.
    pq_barrier = make_parquet_barrier(spark)
    disk = _want_disk(n_docs_hint)
    stage = prepare_documents(pages, use_extractor=use_extractor)
    if _use_parquet(disk):
        docs = pq_barrier(stage, "docs")
    else:
        docs = stage.localCheckpoint(
            eager=True,
            storageLevel=StorageLevel.DISK_ONLY if disk else None,
        )
    if disk is None:
        # auto with no hint: one cheap count of the materialized barrier
        # decides storage for the remaining (larger) corpus-sized barriers
        # (the docs barrier itself stays where it landed)
        disk = _want_disk(docs.count())
    barrier_level = StorageLevel.DISK_ONLY if disk else None
    barrier = pq_barrier if _use_parquet(disk) else None
    _mark("docs_extract", _t)

    # The three doc-derived materializations — MinHash/SimHash signatures
    # (inside candidate_pairs), the per-doc token table, and the winnow
    # fingerprint candidates — depend only on `docs` and are independent of
    # each other, so they run as CONCURRENT driver threads in their own
    # FAIR pools. Serially, each job's fixed driver latency (plan, AQE
    # re-opt, barrier) adds up; overlapped, the fixed costs hide under
    # whichever branch is longest, which is what lifts multi-core scaling
    # (the 4N-core leg is latency-bound, not compute-bound).
    def _in_pool(pool: str, fn):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        t0 = time.time()
        try:
            return fn()
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            _mark(f"branch_{pool}", t0)

    # Branch-pool width is SCALE-ADAPTIVE (reusing the corpus-size signal
    # that already drives barrier storage): small corpora run all three
    # branches at once — the phases are latency-bound there and a 3-wide
    # pool measured consistently faster at 20k docs (alternating A/B,
    # adjacent pairs 23.4/18.1, 17.4/15.5, 15.4/15.0 s for 2 vs 3).
    # Large corpora keep 2: the signature and winnow branches are both
    # Arrow/pandas-UDF heavy (each stage spawns one Python worker per
    # core), and at memory-bandwidth-bound multi-million-doc scale
    # running all three at once triples the worker fleet and thrashes
    # the bus (r5 measurement). Two at a time still hides the fixed
    # latency (the JVM-only token branch overlaps the signature UDFs).
    _t_block = time.time()
    with ThreadPoolExecutor(max_workers=2 if disk else 3) as ex:
        f_cands = ex.submit(
            _in_pool,
            "signatures",
            lambda: candidate_pairs(
                docs, cfg, barrier_level=barrier_level, barrier=barrier
            ),
        )
        f_tokens = ex.submit(
            _in_pool,
            "tokens",
            # parquet-barrier (multi-JVM) runs write doc_tokens BUCKETED
            # by id: both verify joins then read the token table already
            # co-partitioned on the join key — the two per-side exchanges
            # (+ sorts) of the token payload disappear, which was the
            # worst-scaling phase across separate executor JVMs
            # (SCALING_r06_lc4: verify 0.36 efficiency on a 4x grant).
            # Single-JVM block barriers are unchanged.
            lambda: (
                barrier(
                    prepare_tokens(docs),
                    "doc_tokens",
                    bucket_by=(
                        "id" if cfg.tokens_barrier_bucketed else None
                    ),
                )
                if barrier is not None
                else prepare_tokens(docs).localCheckpoint(
                    eager=True, storageLevel=barrier_level
                )
            ),
        )
        f_subc = (
            ex.submit(
                _in_pool,
                "winnow",
                lambda: substring_candidate_pairs(
                    docs, "id", "text", cfg.substring_gram,
                    cfg.substring_window, cfg.all_pairs_cap,
                    barrier_level=barrier_level, barrier=barrier,
                ),
            )
            if cfg.substring_enabled
            else None
        )
        # candidate generation stays fused with verification: the family
        # branches schedule concurrently inside one job and fill the
        # cluster (a barrier here measured ~1.5x slower end-to-end)
        cands = f_cands.result()
        prepped = f_tokens.result()
        sub_cands = f_subc.result() if f_subc is not None else None
    _mark("branch_block_wall", _t_block)

    _t = time.time()
    # filtered=False + filter on the materialized column: the threshold
    # predicate would otherwise be pushed below the scoring projection and
    # re-evaluate the score expression per row (see verify_candidate_pairs)
    verified = verify_candidate_pairs(
        cands, docs, cfg, prepped=prepped, filtered=False
    ).localCheckpoint(eager=True).filter(
        F.col("score") >= cfg.verify_threshold
    )
    _mark("verify", _t)
    all_pairs = verified
    if cfg.substring_enabled:
        # cluster the cheap edges first so the expensive substring stage can
        # skip intra-cluster candidates. Capped at cheap_cc_max_iter: a
        # partially converged clustering is a FINER sound partition (equal
        # labels still imply connected), so the exclusion prunes less but
        # never wrongly — and this CC's only job is pruning.
        _t = time.time()
        cc_stats: dict = {}
        cheap_cc = connected_components(
            verified.filter(F.col("score") >= cfg.cluster_threshold).select(
                "id_a", "id_b"
            ),
            max_iter=cfg.cheap_cc_max_iter,
            stats=cc_stats,
            # verified is one row per pair (candidate groupBy) -> skip the
            # entry distinct exchange
            edges_distinct=True,
        ).localCheckpoint(eager=True)
        _mark("cheap_cc", _t)
        if timings is not None:
            timings["cheap_cc_rounds"] = cc_stats.get("rounds", 0)
            timings["cheap_cc_entry_edges"] = cc_stats.get("entry_edges", 0)
        all_pairs = all_pairs.unionByName(
            substring_pairs(
                docs, cfg, exclude=verified, exclude_clusters=cheap_cc,
                cands=sub_cands,
            )
        )

    _t = time.time()
    prio = F.when(F.lit(False), F.lit(0))
    for m, p in METHOD_PRIORITY.items():
        prio = prio.when(F.col("method") == m, F.lit(p))
    # every pipeline method is in METHOD_PRIORITY and status is the
    # constant 'pending', so the hash-aggregable specialization applies
    # (identical output to first_wins, no SortAggregate)
    pairs = first_wins_by_priority(
        all_pairs.withColumn("priority", prio.otherwise(F.lit(99))),
        METHOD_PRIORITY,
    ).persist()
    _mark("build_tail", _t)

    # NOTE: connected_components runs its driver loop HERE — its first
    # fingerprint job is also what materializes the persisted pairs table
    # (substring LCS + first-wins dedup), so this marked interval covers
    # substring verification + pair dedup + all final CC rounds.
    _t = time.time()
    edges = pairs.filter(
        (F.col("score") >= cfg.cluster_threshold)
        | (F.col("method") == "substring")
    )
    final_cc_stats: dict = {}
    cc = connected_components(
        edges.select("id_a", "id_b"), stats=final_cc_stats,
        # pairs is one row per pair (first_wins) -> skip the entry distinct
        edges_distinct=True,
    )
    _mark("substring_pairs_and_cc_rounds", _t)
    if timings is not None:
        timings["final_cc_rounds"] = final_cc_stats.get("rounds", 0)
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


def run_pipeline_checkpointed(
    spark,
    pages: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
    use_extractor: bool = True,
    n_score_buckets: int = 8,
) -> dict[str, DataFrame]:
    """run_pipeline with durable per-stage checkpoints + resumable scoring.

    Every stage writes parquet + a lineage manifest (rows, counters, config
    fingerprint) under ``workdir``; the expensive verification stage commits
    per-bucket (pmod(xxhash64(pair), n_score_buckets)), so a killed job
    resumes from the last completed bucket. A changed PipelineConfig or
    extractor version invalidates all checkpoints via the fingerprint.
    """
    from ufo_dedup_spark.checkpoint import CheckpointManager, config_fingerprint
    from ufo_dedup_spark.functions.extract import EXTRACTOR_VERSION
    from ufo_dedup_spark.functions.hashing import SIGNATURE_VERSION

    cfg = cfg or PipelineConfig()
    # SIGNATURE_VERSION is part of the fingerprint: a kernel rewrite changes
    # signature bytes even when every cfg field matches, and resuming buckets
    # computed under old hash functions would silently mix incompatible
    # candidate sets. PIPELINE_LOGIC_VERSION covers the complementary case:
    # stage semantics / inter-stage schema changes with identical cfg and
    # kernels (see its definition above).
    mgr = CheckpointManager(
        spark,
        workdir,
        config_fingerprint(
            cfg,
            EXTRACTOR_VERSION,
            SIGNATURE_VERSION,
            PIPELINE_LOGIC_VERSION,
            use_extractor,
        ),
    )

    docs = mgr.stage(
        "docs", lambda: prepare_documents(pages, use_extractor=use_extractor)
    )
    prepped = mgr.stage("doc_tokens", lambda: prepare_tokens(docs))
    cands = mgr.stage("candidates", lambda: candidate_pairs(docs, cfg))
    verified = mgr.partitioned_stage(
        "verified",
        cands,
        F.pmod(F.xxhash64("id_a", "id_b"), F.lit(n_score_buckets)),
        n_score_buckets,
        lambda part: verify_candidate_pairs(part, docs, cfg, prepped=prepped),
    )

    all_pairs = verified
    if cfg.substring_enabled:
        cheap_cc = mgr.stage(
            "cheap_clusters",
            # capped like run_pipeline's cheap_cc: a partially converged
            # partition is finer but sound, so it only prunes less
            lambda: connected_components(
                verified.filter(F.col("score") >= cfg.cluster_threshold).select(
                    "id_a", "id_b"
                ),
                max_iter=cfg.cheap_cc_max_iter,
                edges_distinct=True,
            ),
        )
        sub = mgr.stage(
            "substring_pairs",
            lambda: substring_pairs(
                docs, cfg, exclude=verified, exclude_clusters=cheap_cc
            ),
        )
        all_pairs = all_pairs.unionByName(sub)

    def build_pairs():
        prio = F.when(F.lit(False), F.lit(0))
        for m, p in METHOD_PRIORITY.items():
            prio = prio.when(F.col("method") == m, F.lit(p))
        return first_wins_by_priority(
            all_pairs.withColumn("priority", prio.otherwise(F.lit(99))),
            METHOD_PRIORITY,
        )

    pairs = mgr.stage("pairs", build_pairs)

    def build_clusters():
        edges = pairs.filter(
            (F.col("score") >= cfg.cluster_threshold)
            | (F.col("method") == "substring")
        )
        cc = connected_components(
            edges.select("id_a", "id_b"), edges_distinct=True
        )
        return (
            docs.select("id", "url")
            .join(cc, on="id", how="left")
            .select(
                "id",
                "url",
                F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
            )
        )

    clusters = mgr.stage("clusters", build_clusters)
    return {
        "docs": docs,
        "pairs": pairs,
        "clusters": clusters,
        "lineage": mgr.counters(),
    }
