"""Adversarial + second-seed recall suites (VERDICT r2 stretch item):
the 1.0 recalls must not be a single-seed artifact, and the pipeline must
survive hostile inputs — multi-byte UTF-8, 1-token docs, empty docs,
megabyte-scale docs — without crashing or producing spurious clusters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ufo_dedup_spark.pipeline import PipelineConfig, prepare_documents, run_pipeline
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes

SEED2 = 1337


@pytest.fixture(scope="module")
def corpus2(spark):
    pages, truth_pairs, truth_clusters = corpus_dataframes(
        spark, SynthConfig(n_docs=600, seed=SEED2)
    )
    return pages.persist(), truth_pairs.persist(), truth_clusters.persist()


def test_second_seed_pair_recall(spark, corpus2):
    """Recall >= 0.99 per planted kind under a different RNG seed."""
    pages, truth_pairs, _ = corpus2
    result = run_pipeline(spark, pages, PipelineConfig())
    ids = prepare_documents(pages, use_extractor=False).select("id", "url")
    p = (
        result["pairs"]
        .join(ids.select(F.col("id").alias("id_a"), F.col("url").alias("url_a")), "id_a")
        .join(ids.select(F.col("id").alias("id_b"), F.col("url").alias("url_b")), "id_b")
    )
    predicted = {tuple(sorted((r["url_a"], r["url_b"]))) for r in p.collect()}
    by_kind: dict[str, list[bool]] = {}
    for r in truth_pairs.collect():
        hit = tuple(sorted((r["url_a"], r["url_b"]))) in predicted
        by_kind.setdefault(r["kind"], []).append(hit)
    recalls = {k: sum(v) / len(v) for k, v in by_kind.items()}
    for kind in ("exact", "near", "prefix", "span"):
        assert recalls.get(kind, 0.0) >= 0.99, recalls


# --- hostile handmade corpus ------------------------------------------------

CJK = (
    "近代的な都市の夜景は様々な色の光で満たされている。川沿いの遊歩道を歩くと "
    "高層ビルの窓明かりが水面に揺れて見える。週末には多くの人々が集まり "
    "路上の屋台で温かい食事を楽しむ。"
)
EMOJI = "🛸 unidentified 🛰️ aerial 🌌 phenomena über café naïve résumé "


def _adversarial_pages(spark):
    cjk_long = (CJK + " ") * 12          # multi-byte shared span source
    huge = ("lorem ipsum dolor sit amet " * 40000).strip()  # ~1.08M chars
    rows = [
        # exact unicode duplicates
        ("http://adv/u1", cjk_long, "ja"),
        ("http://adv/u2", cjk_long, "ja"),
        # near-duplicate unicode (small tail edit)
        ("http://adv/u3", cjk_long + " 追加の文章です", "ja"),
        # emoji/diacritics exact pair
        ("http://adv/e1", (EMOJI * 15).strip(), "en"),
        ("http://adv/e2", (EMOJI * 15).strip(), "en"),
        # shared 400+-char CJK span embedded in different documents
        ("http://adv/s1", "prefix one " * 30 + CJK * 4 + " suffix alpha " * 30, "ja"),
        ("http://adv/s2", "intro two " * 30 + CJK * 4 + " ending beta " * 30, "ja"),
        # 1-token docs (no shingles possible) — identical pair + a distinct one
        ("http://adv/t1", "supercalifragilistic", "en"),
        ("http://adv/t2", "supercalifragilistic", "en"),
        ("http://adv/t3", "antidisestablishment", "en"),
        # empty / whitespace-only docs
        ("http://adv/z1", "", "en"),
        ("http://adv/z2", "", "en"),
        ("http://adv/z3", "   \n\t  ", "en"),
        # megabyte-scale doc pair (identical) + an unrelated big doc
        ("http://adv/h1", huge, "en"),
        ("http://adv/h2", huge, "en"),
        ("http://adv/h3", ("consectetur adipiscing elit sed do " * 30000).strip(), "en"),
    ]
    # filler singletons so the corpus isn't only adversarial rows
    rows += [
        (f"http://adv/f{i}", f"unique filler document number {i} " * 8, "en")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def adv_result(spark):
    pages = _adversarial_pages(spark)
    return run_pipeline(spark, pages, PipelineConfig(), use_extractor=False)


def _url_pairs(spark, adv_result):
    ids = adv_result["docs"].select("id", "url")
    p = (
        adv_result["pairs"]
        .join(ids.select(F.col("id").alias("id_a"), F.col("url").alias("url_a")), "id_a")
        .join(ids.select(F.col("id").alias("id_b"), F.col("url").alias("url_b")), "id_b")
    )
    return {
        tuple(sorted((r["url_a"], r["url_b"]))): (r["method"], r["score"])
        for r in p.collect()
    }


def test_unicode_exact_and_near_pairs(spark, adv_result):
    pairs = _url_pairs(spark, adv_result)
    assert ("http://adv/u1", "http://adv/u2") in pairs
    assert ("http://adv/e1", "http://adv/e2") in pairs
    near = [k for k in pairs if "u3" in k[0] + k[1] and ("u1" in k[0] + k[1] or "u2" in k[0] + k[1])]
    assert near, "unicode near-duplicate not recovered"


def test_multibyte_winnow_span_pair(spark, adv_result):
    """The shared CJK span (>= min_span chars) must surface a pair — the
    winnowing guarantee has to hold on multi-byte UTF-8 input."""
    pairs = _url_pairs(spark, adv_result)
    assert ("http://adv/s1", "http://adv/s2") in pairs


def test_one_token_and_huge_docs(spark, adv_result):
    pairs = _url_pairs(spark, adv_result)
    assert ("http://adv/t1", "http://adv/t2") in pairs  # exact path
    assert ("http://adv/h1", "http://adv/h2") in pairs
    # distinct 1-token / big docs never pair with their namesakes
    assert ("http://adv/t1", "http://adv/t3") not in pairs
    assert ("http://adv/h1", "http://adv/h3") not in pairs


def test_empty_docs_never_cross_pair(spark, adv_result):
    """Empty/whitespace docs must not pair with any NON-empty doc, and
    filler singletons stay singletons."""
    pairs = _url_pairs(spark, adv_result)
    empties = {"http://adv/z1", "http://adv/z2", "http://adv/z3"}
    for (a, b), _ in pairs.items():
        assert not (
            (a in empties) ^ (b in empties)
        ), f"empty doc paired with non-empty: {a}, {b}"
    clusters = {
        r["url"]: r["cluster_id"] for r in adv_result["clusters"].collect()
    }
    filler = [u for u in clusters if u.startswith("http://adv/f")]
    cluster_of = [clusters[u] for u in filler]
    assert len(set(cluster_of)) == len(filler), "filler docs merged"
