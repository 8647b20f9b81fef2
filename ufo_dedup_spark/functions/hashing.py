"""Vectorized MinHash / SimHash / winnowing fingerprints as pandas UDFs.

The web-scale signature stage (north rule): per Arrow batch, numpy does the
permutation math; the only per-item Python work is shingle hashing via
zlib.crc32 / blake2b (both C-speed). Signatures are deterministic functions
of (text, config) — fixed seeds, so resume/re-run produce identical bytes.

Banding note: LSH band hashes are derived from the signature JVM-side
(operators/minhash_lsh.py) so the UDF output stays a single array column.
"""

from __future__ import annotations

from hashlib import blake2b
from zlib import crc32

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE61 = (1 << 61) - 1
_MAX_U32 = (1 << 32) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-word-shingle hashes (uint64) of a document."""
    toks = text.split()
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (crc32(s.encode("utf-8")) for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_perm: int = 128, shingle_k: int = 5, seed: int = 42):
    """Returns a pandas UDF text -> array<long> MinHash signature.

    sig[j] = min over shingles x of ((a_j * x + b_j) mod M61); empty/None
    docs get a NULL signature. NULL (not a shared sentinel) matters: any
    constant sentinel makes all empty docs band-identical, so they co-bucket
    in every LSH band and generate O(n_empty^2) candidate pairs that
    verification then has to discard. Banding filters NULL signatures out
    (operators/minhash_lsh.py), so empty docs never enter a bucket.
    """
    a, b = _perm_params(num_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            x = _shingle_hashes(t, shingle_k)
            if x.size == 0:
                out.append(None)
                continue
            # Exact (a*x + b) mod M61 in uint64 without overflow:
            # split a = a_hi*2^32 + a_lo (x < 2^32 from crc32, a < 2^61).
            # a_lo*x < 2^64 fits; a_hi*x < 2^61 fits; since 2^61 = 1 (mod
            # M61), t*2^32 mod M61 = ((t<<32) & M61) + (t >> 29).
            m61 = np.uint64(_MERSENNE61)
            lo = (a & np.uint64(0xFFFFFFFF))[:, None] * x[None, :]
            lo = (lo & m61) + (lo >> np.uint64(61))  # < 2^61 + 8
            hi = (a >> np.uint64(32))[:, None] * x[None, :]
            hi = ((hi << np.uint64(32)) & m61) + (hi >> np.uint64(29))
            v = lo + hi + b[:, None]  # < 3*2^61 + 2^33, fits uint64
            v = (v & m61) + (v >> np.uint64(61))
            v = np.where(v >= m61, v - m61, v)
            v = np.where(v >= m61, v - m61, v)
            out.append(v.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return minhash_udf


def make_simhash_udf(shingle_k: int = 2, seed: int = 42):
    """Returns a pandas UDF text -> long 64-bit SimHash fingerprint.

    Per doc: 64-bit blake2b hashes of k-word shingles, bit-vote, sign-pack.
    Empty/None docs get NULL (same rationale as MinHash: a constant
    fingerprint would co-bucket every empty doc in every chunk block).
    """
    salt = seed.to_bytes(8, "little")

    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out: list = [None] * len(texts)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = t.split()
            if len(toks) < shingle_k:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [
                    " ".join(toks[j : j + shingle_k])
                    for j in range(len(toks) - shingle_k + 1)
                ]
            if not grams:
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(
                        blake2b(g.encode("utf-8"), digest_size=8, key=salt).digest(),
                        "little",
                    )
                    for g in set(grams)
                ),
                dtype=np.uint64,
                count=len(set(grams)),
            )
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).sum(axis=0)
            fp = np.uint64(0)
            majority = hs.size / 2.0
            for bit in np.nonzero(bits > majority)[0]:
                fp |= np.uint64(1) << np.uint64(bit)
            out[i] = int(fp.astype(np.int64))
        return pd.Series(out, dtype="object")

    return simhash_udf


def make_winnow_udf(gram_chars: int = 64, window: int = 48):
    """Returns a pandas UDF text -> array<long> winnowed rolling-hash
    fingerprints (the exact-substring candidate generator).

    Rolling crc32 over ``gram_chars``-char grams sampled by winnowing: the
    minimum hash in every ``window`` of consecutive gram positions. Two docs
    sharing a substring of length >= gram_chars + window - 1 are guaranteed
    to share at least one fingerprint (standard winnowing guarantee).
    """

    @pandas_udf(ArrayType(LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t or len(t) < gram_chars:
                out.append([])
                continue
            data = t.encode("utf-8", "surrogatepass")
            n = len(data) - gram_chars + 1
            hs = np.fromiter(
                (crc32(data[i : i + gram_chars]) for i in range(n)),
                dtype=np.int64,
                count=n,
            )
            if n <= window:
                out.append(np.unique(hs.min(keepdims=True)))
                continue
            # sliding-window minimum via stride trick
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            out.append(np.unique(sw.min(axis=1)))
        return pd.Series(out)

    return winnow_udf


def minhash_signature(text: str, num_perm: int = 128, shingle_k: int = 5,
                      seed: int = 42) -> np.ndarray | None:
    """Single-doc reference implementation (tests): exact same math as the
    UDF, via python ints (no overflow concerns). None for empty docs,
    mirroring the UDF's NULL-signature contract."""
    a, b = _perm_params(num_perm, seed)
    x = _shingle_hashes(text, shingle_k)
    if x.size == 0:
        return None
    sig = np.empty(num_perm, dtype=np.int64)
    for j in range(num_perm):
        vals = (int(a[j]) * x.astype(object) + int(b[j])) % _MERSENNE61
        sig[j] = int(min(vals))
    return sig
