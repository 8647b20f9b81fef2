"""Data-fix battery (F5): ordering contract + per-fix pinned cases, ported
from reference tests/test_data_quality.py:1275-1483 and rebuild_db.py:74-307.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ufo_dedup_spark.functions.fixes import (
    apply_data_fixes,
    normalize_country_col,
    repair_coordinate_col,
    titlecase_shape_col,
)

SIGHTING_SCHEMA = (
    "id int, source string, date_event string, date_event_raw string, "
    "time_raw string, shape string, hynek string, vallee string, "
    "description string, city string, raw_text string, state string, "
    "country string, latitude double, longitude double"
)


def _row(
    id=0,
    source="MUFON",
    date_event=None,
    date_event_raw=None,
    time_raw=None,
    shape=None,
    hynek=None,
    vallee=None,
    description="test",
    city=None,
    raw_text=None,
    state=None,
    country=None,
    latitude=None,
    longitude=None,
):
    return (
        id, source, date_event, date_event_raw, time_raw, shape, hynek,
        vallee, description, city, raw_text, state, country, latitude,
        longitude,
    )


def _fix_one(spark, **kwargs):
    df = spark.createDataFrame([_row(**kwargs)], SIGHTING_SCHEMA)
    return apply_data_fixes(df).collect()[0]


# --- ordering contract (reference test_data_quality.py:1275-1483) ---------


def test_literal_backslash_n_then_day00(spark):
    r"""'1985-07-00\n12:00AM' -> strip \n -> day-00 truncation -> '1985-07'."""
    out = _fix_one(spark, date_event="1985-07-00\\n12:00AM")
    assert out["date_event"] == "1985-07"
    assert out["time_raw"] == "12:00AM"


def test_literal_backslash_n_then_month00(spark):
    out = _fix_one(spark, date_event="1957-00-00\\n12:00AM")
    assert out["date_event"] == "1957"
    assert out["time_raw"] == "12:00AM"


def test_real_newline_then_year0000(spark):
    out = _fix_one(spark, date_event="0000-12-29\n4:20AM")
    assert out["date_event"] is None  # year-0000 nulled AFTER the split
    assert out["time_raw"] == "4:20AM"  # time preserved


def test_shape_titlecase_then_typo(spark):
    """'frieball' needs titlecase FIRST, then the typo map hits 'Frieball'."""
    out = _fix_one(spark, shape="frieball")
    assert out["shape"] == "Fireball"


def test_all_fixes_on_single_record(spark):
    out = _fix_one(
        spark,
        date_event="2020-05-15\n8:00PM",
        description="[MISSING DATA]",
        shape="fireball",
    )
    assert out["date_event"] == "2020-05-15"
    assert out["time_raw"] == "8:00PM"
    assert out["shape"] == "Fireball"
    assert out["description"] is None


# --- per-fix pinned cases --------------------------------------------------


def test_ufocat_longitude_us_positive_negated(spark):
    out = _fix_one(spark, source="UFOCAT", state="AZ", longitude=112.07)
    assert out["longitude"] == pytest.approx(-112.07)


def test_ufocat_longitude_us_negative_kept(spark):
    out = _fix_one(spark, source="UFOCAT", state="AZ", longitude=-112.07)
    assert out["longitude"] == pytest.approx(-112.07)


def test_ufocat_longitude_rest_of_world_always_negated(spark):
    # Eastern hemisphere stored negative -> becomes positive; and vice versa
    out = _fix_one(spark, source="UFOCAT", state=None, longitude=-2.35)
    assert out["longitude"] == pytest.approx(2.35)
    out = _fix_one(spark, source="UFOCAT", state="XX", longitude=55.0)
    assert out["longitude"] == pytest.approx(-55.0)


def test_non_ufocat_longitude_untouched(spark):
    out = _fix_one(spark, source="NUFORC", state="AZ", longitude=112.07)
    assert out["longitude"] == pytest.approx(112.07)


def test_ufocat_city_backfill_from_raw_text(spark):
    out = _fix_one(spark, source="UFOCAT", city=None, raw_text="PHOENIX")
    assert out["city"] == "PHOENIX"
    out = _fix_one(spark, source="UFOCAT", city="MESA", raw_text="PHOENIX")
    assert out["city"] == "MESA"


def test_country_normalization(spark):
    df = spark.createDataFrame(
        [("USA",), ("United Kingdom",), ("Canada",), ("France",), (None,)],
        "c string",
    )
    got = [
        r["n"] for r in df.select(normalize_country_col(F.col("c")).alias("n")).collect()
    ]
    assert got == ["US", "GB", "CA", "France", None]


def test_mufon_date_event_raw_backslash_n_spaced(spark):
    out = _fix_one(spark, date_event_raw="1992-08-19\\n5:45AM")
    assert out["date_event_raw"] == "1992-08-19 5:45AM"


def test_newline_split_requires_null_time_raw(spark):
    out = _fix_one(spark, date_event="1985-07-01\\n9:00PM", time_raw="8:00AM")
    assert out["date_event"] == "1985-07-01\\n9:00PM"  # not split
    assert out["time_raw"] == "8:00AM"


def test_negative_year_nulled(spark):
    out = _fix_one(spark, source="UFOCAT", date_event="-044-07-01")
    assert out["date_event"] is None


def test_impossible_calendar_dates_truncated(spark):
    assert _fix_one(spark, date_event="2001-02-30")["date_event"] == "2001-02"
    assert _fix_one(spark, date_event="2001-04-31")["date_event"] == "2001-04"
    assert _fix_one(spark, date_event="2001-04-30")["date_event"] == "2001-04-30"
    assert _fix_one(spark, date_event="2001-02-29")["date_event"] == "2001-02-29"


def test_shape_hyphenated(spark):
    df = spark.createDataFrame([("V-shape",), ("v-SHAPE",)], "s string")
    got = [
        r["t"] for r in df.select(titlecase_shape_col(F.col("s")).alias("t")).collect()
    ]
    assert got == ["V-Shape", "V-Shape"]


def test_shape_multiword_untouched(spark):
    out = _fix_one(spark, shape="flying disc")
    assert out["shape"] == "flying disc"


def test_junk_shapes_nulled(spark):
    for junk in ("1", "2"):
        assert _fix_one(spark, shape=junk)["shape"] is None
    # reference quirk, preserved: titlecase (fix 8) runs BEFORE the junk
    # list (fix 10), so 'ps' has already become 'Ps' and survives —
    # rebuild_db.py:203-248 ordering.
    assert _fix_one(spark, shape="ps")["shape"] == "Ps"


def test_hynek_vallee_uppercased(spark):
    out = _fix_one(spark, hynek="cE1", vallee="ma-1")
    assert out["hynek"] == "CE1"
    assert out["vallee"] == "MA-1"


def test_razor_boilerplate_stripped(spark):
    desc = (
        "Submitted by razor via e-mail and so on template text "
        "Investigator Notes: the actual sighting report body"
    )
    out = _fix_one(spark, description=desc)
    assert out["description"] == "the actual sighting report body"


def test_razor_boilerplate_without_notes_nulled(spark):
    out = _fix_one(
        spark, description="Submitted by razor via e-mail nothing else"
    )
    assert out["description"] is None


def test_razor_boilerplate_with_empty_notes_nulled(spark):
    out = _fix_one(
        spark,
        description="Submitted by razor via e-mail Investigator Notes:   ",
    )
    assert out["description"] is None


def test_razor_non_mufon_untouched(spark):
    desc = "Submitted by razor via e-mail Investigator Notes: body"
    out = _fix_one(spark, source="NUFORC", description=desc)
    assert out["description"] == desc


def test_coordinate_repair_cascade(spark):
    cases = [
        (912.5, 91.25),  # /10
        (9125.0, 91.25),  # /100... first divisor landing in range wins
        (-1800.01, -18.0001),  # /10 still out of range -> /100
        (45.0, 45.0),  # in range untouched
        (None, None),
        (1e12, None),  # unfixable -> NULL (1e12/10^4 still > 180)
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "v double")
    got = [
        r["r"]
        for r in df.select(
            repair_coordinate_col(F.col("v"), 180.0).alias("r")
        ).collect()
    ]
    for (inp, expected), g in zip(cases, got):
        if expected is None:
            assert g is None, inp
        else:
            assert g == pytest.approx(expected), inp


def test_latitude_repair_limit_90(spark):
    df = spark.createDataFrame([(912.5,), (91.0,)], "v double")
    got = [
        r["r"]
        for r in df.select(repair_coordinate_col(F.col("v"), 90.0).alias("r")).collect()
    ]
    assert got[0] == pytest.approx(91.25) or got[0] == pytest.approx(9.125)
    # 912.5/10 = 91.25 > 90 -> /100 = 9.125
    assert got[0] == pytest.approx(9.125)
    assert got[1] == pytest.approx(9.1)  # 91 > 90 -> /10


def test_battery_is_single_projection(spark):
    """Scale contract: the whole battery must not introduce shuffles —
    explain() shows a scan + project only."""
    df = spark.createDataFrame([_row()], SIGHTING_SCHEMA)
    plan = apply_data_fixes(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- full interaction matrix (reference TestDateFixOrdering/TestFixOrdering,
# test_data_quality.py:1275-1483, crossed over sources x date forms) --------

# each case: (kwargs for _row, {column: expected_after_battery})
MATRIX = [
    # date chain: newline split (literal + real) x source x preset time_raw
    (dict(source="MUFON", date_event="1985-07-00\\n12:00AM"),
     dict(date_event="1985-07", time_raw="12:00AM")),
    (dict(source="MUFON", date_event="1957-00-00\\n12:00AM"),
     dict(date_event="1957", time_raw="12:00AM")),
    (dict(source="MUFON", date_event="0000-12-29\\n4:20AM"),
     dict(date_event=None, time_raw="4:20AM")),
    (dict(source="MUFON", date_event="0000-12-29\n4:20AM"),
     dict(date_event=None, time_raw="4:20AM")),
    (dict(source="MUFON", date_event="1985-07-00\n12:00AM"),
     dict(date_event="1985-07", time_raw="12:00AM")),
    # preset time_raw blocks the split but NOT the later date chain
    (dict(source="MUFON", date_event="1985-07-00\\n12:00AM", time_raw="6PM"),
     dict(date_event="1985-07", time_raw="6PM")),
    # non-MUFON: no split, but day-00 truncation still drops the tail
    (dict(source="UFOCAT", date_event="1985-07-00\n12:00AM"),
     dict(date_event="1985-07", time_raw=None)),
    (dict(source="UFOCAT", date_event="1957-00-00"),
     dict(date_event="1957")),
    # year-0000 nulling is MUFON-gated
    (dict(source="UFOCAT", date_event="0000-12-29"),
     dict(date_event="0000-12-29")),
    # negative-year nulling is NOT source-gated
    (dict(source="NUFORC", date_event="-044-07-15"),
     dict(date_event=None)),
    (dict(source="MUFON", date_event="-044-07-15\\n3PM"),
     dict(date_event=None, time_raw="3PM")),
    (dict(source="NUFORC", date_event="1999-05-00"),
     dict(date_event="1999-05")),
    # impossible calendar dates -> YYYY-MM; legal edges untouched
    (dict(source="NUFORC", date_event="2001-02-30"),
     dict(date_event="2001-02")),
    (dict(source="NUFORC", date_event="2001-02-29"),
     dict(date_event="2001-02-29")),
    (dict(source="NUFORC", date_event="2001-04-31"),
     dict(date_event="2001-04")),
    (dict(source="NUFORC", date_event="2001-01-31"),
     dict(date_event="2001-01-31")),
    # month-00 wins before day-00 / impossible-day can see the row
    (dict(source="UFOCAT", date_event="1980-00-31"),
     dict(date_event="1980")),
    (dict(source="MUFON", date_event="2020-00-15\\n5:05PM"),
     dict(date_event="2020", time_raw="5:05PM")),
    # year-0000 null fires before month-00 could truncate to '0000'
    (dict(source="MUFON", date_event="0000-00-00\\n1:00AM"),
     dict(date_event=None, time_raw="1:00AM")),
    (dict(source="NUFORC", date_event="1985-07-15"),
     dict(date_event="1985-07-15")),
    # shape: titlecase before typo map, junk, hyphen/multi-word gates
    (dict(shape="frieball"), dict(shape="Fireball")),
    (dict(source="UFOCAT", shape="BALLK"), dict(shape="Ball")),
    (dict(source="NUFORC", shape="done"), dict(shape="Dome")),
    (dict(shape="triange"), dict(shape="Triangle")),
    (dict(shape="cigar-shaped"), dict(shape="Cigar-Shaped")),
    (dict(shape="flying disk"), dict(shape="flying disk")),
    (dict(source="NUFORC", shape="1"), dict(shape=None)),
    # description: placeholder null, razor strip (MUFON-gated), blank null
    (dict(source="MUFON",
          description="Submitted by razor via e-mail."
                      "  Investigator Notes: saw a light"),
     dict(description="saw a light")),
    (dict(source="MUFON", description="Submitted by razor via e-mail."),
     dict(description=None)),
    (dict(source="NUFORC", description="Submitted by razor via e-mail."),
     dict(description="Submitted by razor via e-mail.")),
    (dict(source="UPDB", description="[MISSING DATA]"),
     dict(description=None)),
    (dict(source="UPDB", description="   "), dict(description=None)),
    # the all-fixes-on-one-record case (reference :1441-1483)
    (dict(source="MUFON", date_event="2020-05-15\\n8:00PM",
          description="[MISSING DATA]", shape="ovois"),
     dict(date_event="2020-05-15", time_raw="8:00PM", description=None,
          shape="Ovoid")),
    # location fixes compose with the rest
    (dict(source="UFOCAT", country="USA", state="NM", longitude=104.5,
          city=None, raw_text="Roswell"),
     dict(country="US", longitude=-104.5, city="Roswell")),
    (dict(source="UFOCAT", state=None, longitude=-2.35),
     dict(longitude=2.35)),
    (dict(source="MUFON", country="United Kingdom", longitude=1.0),
     dict(country="GB", longitude=1.0)),
    (dict(source="NUFORC", hynek="dd", vallee="ma1"),
     dict(hynek="DD", vallee="MA1")),
]


def test_fix_ordering_interaction_matrix(spark):
    """All matrix cases in ONE battery pass (one DataFrame, one projection):
    interactions can only be observed when the fixes run as a chain."""
    rows = [_row(id=i, **kw) for i, (kw, _) in enumerate(MATRIX)]
    df = spark.createDataFrame(rows, SIGHTING_SCHEMA)
    got = {r["id"]: r for r in apply_data_fixes(df).collect()}
    failures = []
    for i, (kw, expect) in enumerate(MATRIX):
        for col, want in expect.items():
            have = got[i][col]
            if have != want:
                failures.append(f"case {i} {kw}: {col}={have!r}, want {want!r}")
    assert not failures, "\n".join(failures)
