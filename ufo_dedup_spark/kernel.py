"""Pure-Python similarity/normalization kernel — the bit-exact parity surface.

These functions reproduce the observable behavior of the reference's scoring
kernel (see /root/reference/dedup.py:53-148 for the semantics being matched);
they are written from the published semantics, not copied. They have NO Spark
dependency so they can be unit-tested directly and wrapped into Arrow-batched
pandas UDFs (functions/similarity.py) for executor-side scoring.

Pinned semantics (the recall>=0.99 anchors, per SURVEY.md §2.8):
- starts-with shortcut returns exactly 0.95, only when both lowered/stripped
  strings are >=20 chars and one is a prefix of the other
- token Jaccard gate at 0.03 returns *the Jaccard value itself*
- SequenceMatcher runs on the first 1000 chars only
- tier-3 prefilter: Jaccard >= 0.25 on text with BOTH source strips applied,
  keep iff final score >= 0.5
- city normalization order: upper -> strip trailing parenthetical -> strip
  trailing [?.!]+ -> collapse whitespace -> trim
"""

from __future__ import annotations

import difflib
import re

# Source-database ids, pinned constants of the reference data model
# (reference: dedup.py:28-32).
SRC_MUFON = 1
SRC_NUFORC = 2
SRC_UFOCAT = 3
SRC_UPDB = 4
SRC_UFOSEARCH = 5

# US state + Canadian province codes accepted by the UFO-search location
# parser (reference: dedup.py:37-46).
US_STATES = frozenset(
    {
        "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
        "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
        "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
        "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
        "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY",
        "DC", "PR", "VI", "GU", "AS", "MP",
        "AB", "BC", "MB", "NB", "NL", "NS", "NT", "NU", "ON", "PE",
        "QC", "SK", "YT",
    }
)

# Similarity-cascade constants (reference: dedup.py:110-124, 570-576).
STARTSWITH_SCORE = 0.95
STARTSWITH_MIN_LEN = 20
JACCARD_GATE = 0.03
SEQMATCH_TRUNC = 1000
TIER3_JACCARD_PREFILTER = 0.25
TIER3_MIN_SCORE = 0.5

_NUFORC_PREFIX_RE = re.compile(r"^NUFORC UFO Sighting \d+\s*")
_MUFON_NOTES_RE = re.compile(r"Investigators?\s*Not(?:es?)?[.:,]?\s*(.+)", re.DOTALL)
_WORD_RE = re.compile(r"\w+")
_CITY_PAREN_RE = re.compile(r"\s*\(.*\)\s*$")
_CITY_PUNCT_RE = re.compile(r"[\?\.\!]+$")
_WS_RE = re.compile(r"\s+")
_CITY_STATE_RE = re.compile(r"^(.+?),\s*([A-Z]{2})\s*\??$", re.IGNORECASE)


def strip_nuforc_prefix(desc: str | None) -> str | None:
    """Drop a leading ``NUFORC UFO Sighting <digits>`` tag (dedup.py:53-59)."""
    if not desc:
        return desc
    if desc.startswith("NUFORC UFO Sighting"):
        return _NUFORC_PREFIX_RE.sub("", desc).strip()
    return desc


def strip_mufon_boilerplate(desc: str | None) -> str | None:
    """Keep only the investigator-notes tail of MUFON template submissions.

    Applies only when the submission marker appears in the first 60 chars;
    if the notes header is absent the text is returned unchanged
    (dedup.py:62-69).
    """
    if not desc:
        return desc
    if "Submitted by razor via e-mail" in desc[:60]:
        m = _MUFON_NOTES_RE.search(desc)
        return m.group(1).strip() if m else desc
    return desc


def tokenize(text: str) -> set[str]:
    """Word-token set: ``\\w+`` over the lowercased text."""
    return set(_WORD_RE.findall(text.lower()))


def token_jaccard(a: str | None, b: str | None) -> float:
    """Token-set Jaccard similarity in [0,1]; 0.0 for empty/None inputs
    (dedup.py:72-83)."""
    if not a or not b:
        return 0.0
    a_tokens = tokenize(a)
    b_tokens = tokenize(b)
    if not a_tokens or not b_tokens:
        return 0.0
    return len(a_tokens & b_tokens) / len(a_tokens | b_tokens)


def preprocess_desc(desc: str | None, source: int | None) -> str | None:
    """Per-source cleanup used by tiers 1-2 (dedup.py:97-105)."""
    if source == SRC_NUFORC:
        desc = strip_nuforc_prefix(desc)
    if source == SRC_MUFON:
        desc = strip_mufon_boilerplate(desc)
    return desc


def compute_similarity(
    desc_a: str | None,
    desc_b: str | None,
    source_a: int | None = None,
    source_b: int | None = None,
) -> float:
    """Staged similarity cascade, bit-exact vs the reference (dedup.py:85-124).

    Order matters and is part of the contract:
      1. per-source strip; empty after strip -> 0.0
      2. starts-with shortcut -> exactly 0.95 (both sides >=20 chars lowered)
      3. token Jaccard < 0.03 -> return the Jaccard value itself
      4. difflib.SequenceMatcher ratio over the first 1000 chars
    """
    if not desc_a or not desc_b:
        return 0.0

    a = preprocess_desc(desc_a, source_a)
    b = preprocess_desc(desc_b, source_b)
    if not a or not b:
        return 0.0

    a_norm = a.strip().lower()
    b_norm = b.strip().lower()
    shorter = min(len(a_norm), len(b_norm))
    if shorter >= STARTSWITH_MIN_LEN and (
        b_norm.startswith(a_norm[:shorter]) or a_norm.startswith(b_norm[:shorter])
    ):
        return STARTSWITH_SCORE

    jaccard = token_jaccard(a, b)
    if jaccard < JACCARD_GATE:
        return jaccard

    return difflib.SequenceMatcher(None, a[:SEQMATCH_TRUNC], b[:SEQMATCH_TRUNC]).ratio()


def normalize_city(city_str: str | None) -> str:
    """Blocking-key city normalization (dedup.py:127-138).

    upper -> drop trailing ``(...)`` qualifier -> drop trailing ``[?.!]+`` ->
    collapse whitespace -> trim. Returns '' for None/empty.
    """
    if not city_str:
        return ""
    c = city_str.strip().upper()
    c = _CITY_PAREN_RE.sub("", c)
    c = _CITY_PUNCT_RE.sub("", c)
    c = _WS_RE.sub(" ", c).strip()
    return c


def parse_ufosearch_city_state(
    raw_text: str | None,
) -> tuple[str | None, str | None]:
    """Extract (CITY, ST) from free text like ``"Phoenix, AZ?"``
    (dedup.py:141-148); state must be a known US/CA code."""
    if not raw_text:
        return None, None
    m = _CITY_STATE_RE.match(raw_text.strip())
    if m and m.group(2).upper() in US_STATES:
        return m.group(1).strip().upper(), m.group(2).upper()
    return None, None
