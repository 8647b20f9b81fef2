"""Post-import data-quality fix battery (F5) as one declarative column pass.

The reference applies 15 order-sensitive UPDATE statements to its sighting
table after import (reference rebuild_db.py:74-307); the ordering contract
is pinned by reference tests/test_data_quality.py:1275-1483 (newline-strip
must precede day-00 truncation, titlecase must precede typo fixes, etc.).

Here the whole battery is a single ``apply_data_fixes`` transformation:
each fix is a conditional column rewrite applied in the reference's order,
so Catalyst collapses the chain into ONE projection inside whole-stage
codegen — a single scan with zero shuffles, versus 15 full-table rewrites.
That is the correct 100 TB shape: the fix battery costs the same as reading
the table once.

Expected columns (the unified-sighting shape): source (source database
name), date_event, date_event_raw, time_raw, shape, hynek, vallee,
description, city, raw_text, state, country, latitude, longitude.
``apply_data_fixes`` skips any fix whose columns are absent, so partial
frames (e.g. location-only) can reuse the battery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ufo_dedup_spark.kernel import US_STATES as US_CA_STATES

# rebuild_db.py:125-131 — Fix 3
COUNTRY_MAP = {
    "USA": "US",
    "United States": "US",
    "United States of America": "US",
    "United Kingdom": "GB",
    "UK": "GB",
    "England": "GB",
    "Canada": "CA",
    "Australia": "AU",
}

# rebuild_db.py:231-241 — Fix 9 (applied AFTER titlecase, so keys are
# titlecased forms)
SHAPE_TYPO_MAP = {
    "Ballk": "Ball",
    "Dumbell": "Dumbbell",
    "Frieball": "Fireball",
    "Triange": "Triangle",
    "Ovois": "Ovoid",
    "Eliptic": "Elliptic",
    "Astrix": "Asterisk",
    "Blim": "Blimp",
    "Done": "Dome",
}

# rebuild_db.py:246-248 — Fix 10
JUNK_SHAPES = ("1", "2", "ps")

RAZOR_PREFIX = "Submitted by razor via e-mail"
NOTES_MARKER = "Investigator Notes:"  # 19 chars


def _map_col(c: Column, mapping: dict[str, str]) -> Column:
    out = c
    expr = F.when(F.lit(False), c)
    for old, new in mapping.items():
        expr = expr.when(c == old, F.lit(new))
    return expr.otherwise(out)


def titlecase_shape_col(shape: Column) -> Column:
    """Fixes 8 + 8b: simple-word titlecase, then First-Second for hyphenated
    values (rebuild_db.py:203-228). Multi-word (space) values untouched."""
    simple = F.concat(
        F.upper(F.substring(shape, 1, 1)), F.lower(F.substring(shape, 2, 2_000_000))
    )
    hy = F.instr(shape, "-")
    hyphenated = F.concat(
        F.upper(F.substring(shape, 1, 1)),
        F.lower(F.substring(shape, 2, hy - 2)),
        F.lit("-"),
        F.upper(F.substring(shape, hy + 1, 1)),
        F.lower(F.substring(shape, hy + 2, 2_000_000)),
    )
    no_hyphen = ~shape.contains("-")
    no_space = ~shape.contains(" ")
    return (
        F.when(shape.isNull(), shape)
        .when(no_hyphen & no_space, simple)
        .when(~no_hyphen, hyphenated)
        .otherwise(shape)
    )


def strip_razor_boilerplate_col(desc: Column, is_mufon: Column) -> Column:
    """Fixes 14/14b/14c: keep the investigator-notes tail of MUFON 'razor'
    template descriptions; boilerplate without notes content nulls out
    (rebuild_db.py:276-301)."""
    has_prefix = desc.startswith(RAZOR_PREFIX)
    notes_at = F.instr(desc, NOTES_MARKER)
    tail = F.trim(F.substring(desc, notes_at + len(NOTES_MARKER), 2_000_000))
    return (
        F.when(
            is_mufon & has_prefix & (notes_at > 0) & (F.length(tail) > 0), tail
        )
        .when(is_mufon & has_prefix, F.lit(None).cast("string"))
        .otherwise(desc)
    )


def fix_date_event_col(date_event: Column, is_mufon: Column) -> Column:
    """Fixes 5-7d on date_event, in the reference's order (newline strip is
    handled by split_newline_date_cols; this applies the post-strip chain):
    year-0000 NULL (MUFON), negative-year NULL, month-00 -> YYYY,
    day-00 -> YYYY-MM, impossible calendar day -> YYYY-MM."""
    d = date_event
    # Fix 6: MUFON year-0000
    d = F.when(is_mufon & d.startswith("0000-"), F.lit(None).cast("string")).otherwise(d)
    # Fix 7: negative years (parsing artifacts)
    d = F.when(d.startswith("-"), F.lit(None).cast("string")).otherwise(d)
    # Fix 7b: month 00 -> year only
    d = F.when(
        d.isNotNull() & (F.length(d) >= 7) & (F.substring(d, 6, 2) == "00"),
        F.substring(d, 1, 4),
    ).otherwise(d)
    # Fix 7c: day 00 -> YYYY-MM
    d = F.when(
        d.isNotNull() & (F.length(d) >= 10) & (F.substring(d, 9, 2) == "00"),
        F.substring(d, 1, 7),
    ).otherwise(d)
    # Fix 7d: impossible calendar dates -> YYYY-MM
    month = F.substring(d, 6, 2)
    day_n = F.substring(d, 9, 2).cast("int")
    impossible = ((month == "02") & (day_n > 29)) | (
        month.isin("04", "06", "09", "11") & (F.substring(d, 9, 2) == "31")
    )
    d = F.when(
        d.isNotNull() & (F.length(d) >= 10) & impossible, F.substring(d, 1, 7)
    ).otherwise(d)
    return d


def split_newline_date_cols(
    date_event: Column, time_raw: Column, is_mufon: Column
) -> tuple[Column, Column]:
    """Fix 5 (+ the real-newline variant from the reference's own test
    battery): MUFON date_event carrying a time after a literal backslash-n
    (2 chars, rebuild_db.py:140-149) or a real newline
    (test_data_quality.py:1404-1419) is split into (date_event, time_raw);
    time_raw only fills when currently NULL."""
    lit_at = F.instr(date_event, "\\n")
    nl_at = F.instr(date_event, "\n")
    can_fix = is_mufon & time_raw.isNull()

    new_time = (
        F.when(can_fix & (lit_at > 0), F.substring(date_event, lit_at + 2, 2_000_000))
        .when(can_fix & (nl_at > 0), F.substring(date_event, nl_at + 1, 2_000_000))
        .otherwise(time_raw)
    )
    new_date = (
        F.when(can_fix & (lit_at > 0), F.substring(date_event, 1, lit_at - 1))
        .when(can_fix & (nl_at > 0), F.substring(date_event, 1, nl_at - 1))
        .otherwise(date_event)
    )
    return new_date, new_time


def repair_coordinate_col(coord: Column, limit: float) -> Column:
    """Coordinate repair cascade (fix_coords.py:59-95): out-of-range values
    are divided by 10/100/1000/10000 until in [-limit, limit] (rounded to 6
    decimals); unfixable values null out. In-range values pass through."""
    out_of_range = coord.isNotNull() & ((coord > limit) | (coord < -limit))
    expr = F.when(~out_of_range, coord)
    for divisor in (10, 100, 1000, 10000):
        cand = coord / divisor
        expr = expr.when(
            (cand >= -limit) & (cand <= limit), F.round(cand, 6)
        )
    return expr.otherwise(F.lit(None).cast("double"))


def normalize_country_col(country: Column) -> Column:
    """Fix 3: exact-value country code normalization (rebuild_db.py:125-131).
    (geocode.py has the larger upper-cased map — see operators/geocode.py.)"""
    return _map_col(country, COUNTRY_MAP)


def apply_data_fixes(df: DataFrame) -> DataFrame:
    """The full ordered battery. Column-presence-gated so partial frames
    reuse individual fixes; order inside matches rebuild_db.apply_data_fixes
    exactly (the pinned ordering contract)."""
    cols = set(df.columns)
    is_ufocat = (
        (F.col("source") == "UFOCAT") if "source" in cols else F.lit(False)
    )
    is_mufon = (
        (F.col("source") == "MUFON") if "source" in cols else F.lit(False)
    )

    # Fix 1a/1b: UFOCAT longitude sign inversion. US/CA rows: positive ->
    # negative. All other UFOCAT rows: negate unconditionally (the source
    # stored every longitude sign-flipped).
    if {"longitude", "state"} <= cols:
        in_us_ca = F.col("state").isin(*sorted(US_CA_STATES))
        lon = F.col("longitude")
        df = df.withColumn(
            "longitude",
            F.when(is_ufocat & in_us_ca & (lon > 0), -lon)
            .when(is_ufocat & ~F.coalesce(in_us_ca, F.lit(False)) & lon.isNotNull(), -lon)
            .otherwise(lon),
        )

    # Fix 2: UFOCAT city backfilled from raw_text
    if {"city", "raw_text"} <= cols:
        df = df.withColumn(
            "city",
            F.when(
                is_ufocat & F.col("city").isNull() & F.col("raw_text").isNotNull(),
                F.col("raw_text"),
            ).otherwise(F.col("city")),
        )

    # Fix 3: country normalization
    if "country" in cols:
        df = df.withColumn("country", normalize_country_col(F.col("country")))

    # Fix 4: MUFON date_event_raw literal backslash-n -> space
    if "date_event_raw" in cols:
        df = df.withColumn(
            "date_event_raw",
            F.when(
                is_mufon & F.col("date_event_raw").contains("\\n"),
                F.replace(F.col("date_event_raw"), F.lit("\\n"), F.lit(" ")),
            ).otherwise(F.col("date_event_raw")),
        )

    # Fix 5 (+ variant): split newline-carried time out of date_event
    if {"date_event", "time_raw"} <= cols:
        d, t = split_newline_date_cols(
            F.col("date_event"), F.col("time_raw"), is_mufon
        )
        # one withColumns call: both expressions must see the PRE-split
        # date_event (chained withColumn would feed t the rewritten column)
        df = df.withColumns({"date_event": d, "time_raw": t})

    # Fixes 6-7d: the date chain (order pinned: after the newline split)
    if "date_event" in cols:
        df = df.withColumn(
            "date_event", fix_date_event_col(F.col("date_event"), is_mufon)
        )

    # Fixes 8/8b: shape case normalization (before typo fixes — pinned)
    if "shape" in cols:
        df = df.withColumn("shape", titlecase_shape_col(F.col("shape")))
        # Fix 9: typo corrections
        df = df.withColumn("shape", _map_col(F.col("shape"), SHAPE_TYPO_MAP))
        # Fix 10: junk values
        df = df.withColumn(
            "shape",
            F.when(
                F.col("shape").isin(*JUNK_SHAPES), F.lit(None).cast("string")
            ).otherwise(F.col("shape")),
        )

    # Fixes 11/12: classification codes uppercase
    for c in ("hynek", "vallee"):
        if c in cols:
            df = df.withColumn(c, F.upper(F.col(c)))

    # Fix 13: placeholder descriptions
    if "description" in cols:
        df = df.withColumn(
            "description",
            F.when(
                F.col("description") == "[MISSING DATA]",
                F.lit(None).cast("string"),
            ).otherwise(F.col("description")),
        )
        # Fixes 14/14c: MUFON razor boilerplate
        df = df.withColumn(
            "description",
            strip_razor_boilerplate_col(F.col("description"), is_mufon),
        )
        # Fix 14b: empty leftovers
        df = df.withColumn(
            "description",
            F.when(
                F.col("description").isNotNull()
                & (F.trim(F.col("description")) == ""),
                F.lit(None).cast("string"),
            ).otherwise(F.col("description")),
        )

    return df
