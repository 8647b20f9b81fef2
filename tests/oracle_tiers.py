"""Single-process oracle for the tier pipeline, written from the spec.

A deliberately naive (dict + nested loop) implementation of the reference's
tier semantics (SURVEY.md §2.9) built on the already-parity-pinned kernel
functions. Used by tests to check the distributed DataFrame pipeline against
an independent formulation on randomized corpora.

Row shape: dict with keys
  id, src, date, city, state, country, desc, raw_text
"""

from __future__ import annotations

from collections import defaultdict

from ufo_dedup_spark.kernel import (
    SRC_MUFON,
    SRC_NUFORC,
    SRC_UFOCAT,
    SRC_UFOSEARCH,
    SRC_UPDB,
    compute_similarity,
    normalize_city,
    parse_ufosearch_city_state,
    strip_mufon_boilerplate,
    strip_nuforc_prefix,
    token_jaccard,
)

TIER3_MAX_BLOCK = 20


def _keyed(rows, src, use_raw=False, country=None, city_only=False, parse_raw=False):
    groups = defaultdict(list)
    for r in rows:
        if r["src"] != src or r["date"] is None:
            continue
        if country is not None and r["country"] != country:
            continue
        d = (r["date"] or "")[:10]
        if parse_raw:
            city, state = parse_ufosearch_city_state(r["raw_text"] or "")
            if not city or not d:
                continue
            groups[(d, city, state or "")].append((r["id"], r["desc"]))
            continue
        if city_only:
            if r["city"] is None or not r["city"].strip():
                continue
            city_n = normalize_city(r["city"])
            if not d or not city_n:
                continue
            groups[(d, city_n)].append((r["id"], r["desc"]))
            continue
        city_n = normalize_city(r["raw_text"] if use_raw else r["city"])
        state_n = (r["state"] or "").strip().upper()
        if not d or not city_n:
            continue
        groups[(d, city_n, state_n)].append((r["id"], r["desc"]))
    return groups


def _drop_state(groups):
    out = defaultdict(list)
    for (d, city, _state), items in groups.items():
        out[(d, city)].extend(items)
    return out


def _pairs(a_groups, b_groups, src_a, src_b, method, out):
    for key in set(a_groups) & set(b_groups):
        for a_id, a_desc in a_groups[key]:
            for b_id, b_desc in b_groups[key]:
                if a_id == b_id:
                    continue
                score = compute_similarity(a_desc, b_desc, src_a, src_b)
                lo, hi = min(a_id, b_id), max(a_id, b_id)
                if (lo, hi) not in out:
                    out[(lo, hi)] = (score, method)


def oracle_all_tiers(rows):
    """Returns {(lo, hi): (score, method)} for the full tier pipeline."""
    out: dict[tuple[int, int], tuple[float, str]] = {}

    mufon = _keyed(rows, SRC_MUFON)
    nuforc = _keyed(rows, SRC_NUFORC)
    ufocat = _keyed(rows, SRC_UFOCAT, use_raw=True)
    _pairs(mufon, nuforc, SRC_MUFON, SRC_NUFORC, "tier1a_mufon_nuforc", out)
    _pairs(mufon, ufocat, SRC_MUFON, SRC_UFOCAT, "tier2a_mufon_ufocat", out)
    _pairs(nuforc, ufocat, SRC_NUFORC, SRC_UFOCAT, "tier2b_nuforc_ufocat", out)

    updb = _keyed(rows, SRC_UPDB, country="US", city_only=True)
    for other, name, src in [
        (_drop_state(mufon), "mufon", SRC_MUFON),
        (_drop_state(nuforc), "nuforc", SRC_NUFORC),
        (_drop_state(ufocat), "ufocat", SRC_UFOCAT),
    ]:
        _pairs(updb, other, SRC_UPDB, src, f"tier2c_updb_{name}", out)

    ufosearch = _keyed(rows, SRC_UFOSEARCH, parse_raw=True)
    for other, name, src in [
        (mufon, "mufon", SRC_MUFON),
        (nuforc, "nuforc", SRC_NUFORC),
        (ufocat, "ufocat", SRC_UFOCAT),
    ]:
        _pairs(ufosearch, other, SRC_UFOSEARCH, src, f"tier2d_ufosearch_{name}", out)

    # ---- tier 3 ----
    day_rows = [
        r for r in rows if r["date"] is not None and len(r["date"]) >= 10
    ]
    by_date = defaultdict(lambda: defaultdict(list))
    for r in day_rows:
        by_date[r["date"][:10]][r["src"]].append((r["id"], r["desc"]))
    for d, by_src in by_date.items():
        n = sum(len(v) for v in by_src.values())
        if n > TIER3_MAX_BLOCK or len(by_src) < 2:
            continue
        srcs = sorted(by_src)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                for a_id, a_desc in by_src[srcs[i]]:
                    for b_id, b_desc in by_src[srcs[j]]:
                        lo, hi = min(a_id, b_id), max(a_id, b_id)
                        if (lo, hi) in out:
                            continue
                        a_clean = strip_nuforc_prefix(
                            strip_mufon_boilerplate(a_desc or "")
                        )
                        b_clean = strip_nuforc_prefix(
                            strip_mufon_boilerplate(b_desc or "")
                        )
                        if token_jaccard(a_clean, b_clean) < 0.25:
                            continue
                        score = compute_similarity(a_desc, b_desc, srcs[i], srcs[j])
                        if score >= 0.5:
                            out[(lo, hi)] = (score, "tier3_desc_fuzzy")
    return out
