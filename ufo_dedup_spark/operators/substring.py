"""Exact-substring dedup: winnowing candidates + suffix-array verification.

North-rule extension (no reference analog): find document pairs sharing a
long exact span (>= ``min_span`` chars) even when the documents are
otherwise different — catches quoted/syndicated passages that MinHash's
whole-document Jaccard misses.

Two stages, cheap -> expensive:
1. candidates: winnowed rolling-hash fingerprints (functions/hashing.py
   winnow UDF) exploded and bucket-joined. Winnowing guarantee: any shared
   span of length >= gram_chars + window - 1 yields a shared fingerprint.
2. verification: per candidate pair, the true longest common substring via a
   suffix array + Kasai LCP over a_text + SEP + b_text, inside an
   Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from ufo_dedup_spark.functions.hashing import make_winnow_udf
from ufo_dedup_spark.operators.minhash_lsh import pairs_within_groups


def suffix_array(s: bytes) -> list[int]:
    """Suffix array by prefix doubling, O(n log^2 n)."""
    n = len(s)
    sa = list(range(n))
    rank = list(s)
    tmp = [0] * n
    k = 1
    while True:
        def key(i: int):
            return (rank[i], rank[i + k] if i + k < n else -1)

        sa.sort(key=key)
        tmp[sa[0]] = 0
        for i in range(1, n):
            tmp[sa[i]] = tmp[sa[i - 1]] + (1 if key(sa[i]) != key(sa[i - 1]) else 0)
        rank = tmp[:]
        if rank[sa[-1]] == n - 1:
            return sa
        k <<= 1


def lcp_array(s: bytes, sa: list[int]) -> list[int]:
    """Kasai LCP: lcp[i] = common prefix length of suffixes sa[i-1], sa[i]."""
    n = len(s)
    rank = [0] * n
    for i, p in enumerate(sa):
        rank[p] = i
    lcp = [0] * n
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Exact LCS length via suffix array over a + SEP + b."""
    if not a or not b:
        return 0
    ab = a.encode("utf-8", "surrogatepass")
    bb = b.encode("utf-8", "surrogatepass")
    s = ab + b"\x00" + bb
    boundary = len(ab)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    best = 0
    for i in range(1, len(s)):
        p, q = sa[i - 1], sa[i]
        if (p < boundary) != (q < boundary):
            if lcp[i] > best:
                best = lcp[i]
    return best


@pandas_udf(IntegerType())
def lcs_len_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
    out = [
        longest_common_substring_len(a or "", b or "")
        for a, b in zip(text_a, text_b)
    ]
    return pd.Series(out, dtype="int32")


def substring_candidate_pairs(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    gram_chars: int = 64,
    window: int = 48,
    all_pairs_cap: int = 64,
) -> DataFrame:
    """Distinct candidate pairs sharing >= 1 winnowed fingerprint."""
    winnow = make_winnow_udf(gram_chars=gram_chars, window=window)
    fps = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(winnow(F.col(text_col))).alias("fp"),
    )
    pairs = pairs_within_groups(fps, ["fp"], "_id", all_pairs_cap)
    return pairs.select("id_a", "id_b").distinct()


def verify_substring_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    min_span: int = 200,
) -> DataFrame:
    """Join texts back and keep pairs whose true LCS >= min_span chars.

    Returns (id_a, id_b, lcs_len).
    """
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")
    )
    joined = candidates.join(a, "id_a").join(b, "id_b")
    scored = joined.select(
        "id_a", "id_b", lcs_len_udf(F.col("_ta"), F.col("_tb")).alias("lcs_len")
    )
    return scored.filter(F.col("lcs_len") >= min_span)
