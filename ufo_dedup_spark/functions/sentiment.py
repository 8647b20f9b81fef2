"""Sentiment + emotion scoring surface (K4) as a batched pandas UDF.

The reference scores every sighting description with VADER polarity and
NRCLex 8-emotion counts (reference sentiment.py:63-98, MIN_TEXT_LENGTH=10,
description-else-summary text pick at :63-72). Neither library ships in
this container, so the operator carries two kernels:

- If ``vaderSentiment``/``nrclex`` import, they are used verbatim — output
  then matches the reference bit-for-bit.
- Otherwise a FROZEN mini-lexicon fallback runs: a deterministic, pinned
  word-list scorer with VADER-shaped outputs (compound in [-1, 1],
  pos/neg/neu summing to ~1) and NRC-shaped emotion counts. The fallback
  DIVERGES from real VADER scores by design (documented here, pinned by
  tests) — it exists so the operator class, schema, batching, and plumbing
  are real and testable; swapping the kernel back is one import.

Spark-side shape: one Arrow-batched pandas UDF returning a struct column;
the text-pick and length gate are Column expressions so the Python kernel
only ever sees rows that will actually be scored.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

MIN_TEXT_LENGTH = 10  # sentiment.py:21

EMOTION_KEYS = [
    "joy", "fear", "anger", "sadness",
    "surprise", "disgust", "trust", "anticipation",
]

SENTIMENT_SCHEMA = StructType(
    [
        StructField("compound", DoubleType()),
        StructField("pos", DoubleType()),
        StructField("neg", DoubleType()),
        StructField("neu", DoubleType()),
    ]
    + [StructField(f"emo_{k}", IntegerType()) for k in EMOTION_KEYS]
)

# Frozen fallback lexicon: tiny, pinned, deterministic. Scores produced
# with this table are NOT VADER scores (see module docstring).
_POSITIVE = frozenset(
    "amazing beautiful bright calm good great happy peaceful wonderful "
    "friendly gentle love loved clear".split()
)
_NEGATIVE = frozenset(
    "afraid terrified scared horrible bad evil ugly angry sad terrible "
    "panic fear dread awful threatening".split()
)
_EMOTION_WORDS = {
    "joy": frozenset("happy joy wonderful amazing love loved".split()),
    "fear": frozenset("afraid terrified scared panic fear dread".split()),
    "anger": frozenset("angry furious rage mad".split()),
    "sadness": frozenset("sad terrible awful crying".split()),
    "surprise": frozenset("sudden suddenly surprise astonished strange".split()),
    "disgust": frozenset("disgusting ugly horrible".split()),
    "trust": frozenset("friendly gentle calm peaceful clear".split()),
    "anticipation": frozenset("waiting watched watching expecting hovering".split()),
}

_TOKEN_RE = re.compile(r"[a-z']+")


def _try_import_nlp():
    try:
        from nrclex import NRCLex
        from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

        return SentimentIntensityAnalyzer(), NRCLex
    except ImportError:
        return None, None


def _fallback_scores(text: str) -> tuple:
    toks = _TOKEN_RE.findall(text.lower())
    n = max(len(toks), 1)
    np_ = sum(1 for t in toks if t in _POSITIVE)
    nn = sum(1 for t in toks if t in _NEGATIVE)
    pos = round(np_ / n, 6)
    neg = round(nn / n, 6)
    neu = round(1.0 - pos - neg, 6)
    # bounded, sign-correct compound: (p - n) / sqrt((p-n)^2 + 15), the
    # same normalization shape VADER uses, over raw lexicon hits
    raw = float(np_ - nn)
    compound = round(raw / (raw * raw + 15.0) ** 0.5, 6)
    emo = tuple(
        sum(1 for t in toks if t in _EMOTION_WORDS[k]) for k in EMOTION_KEYS
    )
    return (compound, pos, neg, neu) + emo


def make_sentiment_udf():
    """pandas UDF text -> struct(compound, pos, neg, neu, emo_*). NULL/short
    rows should be filtered out beforehand (score_sentiment does)."""
    analyzer, nrclex_cls = _try_import_nlp()

    @pandas_udf(SENTIMENT_SCHEMA)
    def sentiment_udf(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if not t:
                rows.append((0.0, 0.0, 0.0, 1.0) + (0,) * len(EMOTION_KEYS))
                continue
            if analyzer is not None:
                vs = analyzer.polarity_scores(t)
                try:
                    emo_raw = nrclex_cls(t).raw_emotion_scores
                except Exception:
                    emo_raw = {}
                rows.append(
                    (vs["compound"], vs["pos"], vs["neg"], vs["neu"])
                    + tuple(int(emo_raw.get(k, 0)) for k in EMOTION_KEYS)
                )
            else:
                rows.append(_fallback_scores(t))
        return pd.DataFrame(
            rows, columns=[f.name for f in SENTIMENT_SCHEMA.fields]
        )

    return sentiment_udf


def pick_text_col(description: Column, summary: Column) -> tuple[Column, Column]:
    """(text, text_source): description if long enough, else summary —
    sentiment.py:63-72."""
    desc_ok = description.isNotNull() & (F.length(description) >= MIN_TEXT_LENGTH)
    summ_ok = summary.isNotNull() & (F.length(summary) >= MIN_TEXT_LENGTH)
    text = F.when(desc_ok, description).when(summ_ok, summary)
    source = F.when(desc_ok, F.lit("description")).when(summ_ok, F.lit("summary"))
    return text, source


def score_sentiment(
    df: DataFrame,
    description_col: str = "description",
    summary_col: str = "summary",
) -> DataFrame:
    """Append sentiment/emotion columns; rows without scoreable text are
    dropped (the reference skips them — sentiment.py:45-49)."""
    text, source = pick_text_col(F.col(description_col), F.col(summary_col))
    scored = (
        df.withColumn("_text", text)
        .withColumn("text_source", source)
        .filter(F.col("_text").isNotNull())
    )
    udf = make_sentiment_udf()
    scored = scored.withColumn("_s", udf(F.col("_text")))
    out_cols = [f.name for f in SENTIMENT_SCHEMA.fields]
    return scored.select(
        *df.columns,
        "text_source",
        F.length("_text").alias("text_length"),
        *[F.col(f"_s.{c}").alias(c) for c in out_cols],
    )
