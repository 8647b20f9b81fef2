"""Sentiment surface (K4): schema, text-pick gate, pinned fallback scores.

The container has no vaderSentiment/nrclex, so these tests pin the frozen
fallback kernel; if the real libraries are present the deterministic-shape
tests still hold (scores differ, schema and gating do not)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ufo_dedup_spark.functions.sentiment import (
    EMOTION_KEYS,
    _fallback_scores,
    _try_import_nlp,
    score_sentiment,
)

ROWS = [
    # (id, description, summary)
    (1, "a beautiful calm bright light hovering peaceful and wonderful", None),
    (2, "terrified and scared we saw a horrible threatening evil shape", None),
    (3, "short", "the summary text is long enough to score instead"),
    (4, None, None),  # unscoreable -> dropped
    (5, "tiny", "no"),  # both too short -> dropped
]

SCHEMA = "id int, description string, summary string"


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return score_sentiment(df).collect()


def test_unscoreable_rows_dropped(scored):
    assert {r["id"] for r in scored} == {1, 2, 3}


def test_text_source_pick(scored):
    rows = {r["id"]: r for r in scored}
    assert rows[1]["text_source"] == "description"
    assert rows[3]["text_source"] == "summary"  # description too short
    assert rows[3]["text_length"] == len(ROWS[2][2])


def test_schema_shape(scored):
    r = scored[0]
    for c in ("compound", "pos", "neg", "neu"):
        assert isinstance(r[c], float)
    for k in EMOTION_KEYS:
        assert isinstance(r[f"emo_{k}"], int)


def test_polarity_signs(scored):
    rows = {r["id"]: r for r in scored}
    assert rows[1]["compound"] > 0.2  # strongly positive text
    assert rows[2]["compound"] < -0.2  # strongly negative text
    assert rows[1]["pos"] > rows[1]["neg"]
    assert rows[2]["neg"] > rows[2]["pos"]


def test_emotions_detected(scored):
    rows = {r["id"]: r for r in scored}
    assert rows[2]["emo_fear"] >= 2  # 'terrified', 'scared'
    assert rows[1]["emo_trust"] >= 2  # 'calm', 'peaceful'


def test_fallback_pinned_values():
    """The frozen fallback kernel is deterministic and pinned (these are
    NOT VADER scores — divergence is documented in the module)."""
    if _try_import_nlp()[0] is not None:
        pytest.skip("real VADER present; fallback not in use")
    out = _fallback_scores("a beautiful calm light")
    compound, pos, neg, neu = out[:4]
    assert compound == pytest.approx(2 / (4 + 15) ** 0.5, abs=1e-6)
    assert pos == pytest.approx(0.5)
    assert neg == 0.0
    assert neu == pytest.approx(0.5)
    # bounded
    assert -1.0 <= compound <= 1.0


def test_compound_bounded(spark):
    text = " ".join(["terrified scared horrible"] * 50)
    out = _fallback_scores(text)
    assert -1.0 <= out[0] <= -0.9
