"""extract_historic analog (S11): pre-cutoff filter, date_analysis
derivation, the five ordered classification rules, views, and the full
parquet extract round-trip (reference extract_historic.py:99-260)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows_set
from ufo_dedup_spark.operators.extract_historic import (
    CAT_2DIGIT_ANCIENT,
    CAT_3DIGIT_REVIEW,
    CAT_ANCIENT,
    CAT_CENTURY_ONLY,
    CAT_OTHER_REVIEW,
    CAT_UNCLASSIFIED,
    date_analysis,
    extract_historic,
    pre_cutoff_sightings,
    referenced_locations,
    register_analysis_views,
)

SIGHTING_SCHEMA = (
    "id long, source_db_id int, date_event string, date_event_raw string, "
    "location_id long, description string"
)


@pytest.fixture(scope="module")
def frames(spark):
    # sources: 1=UFOCAT, 2=NUFORC, 3=UPDB (reference source_database rows)
    src = spark.createDataFrame(
        [(1, "UFOCAT"), (2, "NUFORC"), (3, "UPDB")], "id int, name string"
    )
    loc = spark.createDataFrame(
        [
            (10, "roswell, nm", "roswell", None, "nm", "usa", 33.4, -104.5,
             None, "exact"),
            (11, "paris", "paris", None, None, "france", 48.8, 2.35,
             None, "city"),
            (12, "nowhere", "unreferenced", None, None, None, None, None,
             None, None),
        ],
        "id long, raw_text string, city string, county string, state string, "
        "country string, latitude double, longitude double, "
        "geoname_id long, geocode_src string",
    ).select("id", "raw_text", "city", "county", "state", "country",
             "latitude", "longitude", "geoname_id", "geocode_src")
    sightings = spark.createDataFrame(
        [
            # pre-1901, each classification rule (reference
            # extract_historic.py:166-214):
            (1, 1, "1900-01-01", "19/01/..", 10, "century only"),
            (2, 1, "0850-06-01", "850/06", 10, "three digit"),
            (3, 1, "1850-03-01", "1850/03/01", 11, "four digit ancient"),
            (4, 1, "1600-01-01", "16/01", 11, "two digit not 19"),
            (5, 2, "1899-12-31", "12/31/1899", None, "nuforc pre-1901"),
            (6, 3, "0090-01-01", "90-01-01", None, "updb sub-1000"),
            (7, 1, "1890-05-05", None, 10, "no raw date -> unclassified"),
            # excluded by the cutoff filter:
            (8, 1, "1901-01-01", "1901/01", 10, "at cutoff"),
            (9, 2, "1999-07-04", "07/04/1999", 11, "modern"),
            (10, 3, None, "??", 10, "null date"),
            # LENGTH(date_event) >= 4 gate excludes a bare "19"
            (11, 1, "19", "19/..", 10, "too-short date string"),
            (12, 1, "abc", "junk", 10, "unparseable year"),
        ],
        SIGHTING_SCHEMA,
    )
    return sightings, loc, src


def test_pre_cutoff_filter(spark, frames):
    sightings, _, _ = frames
    got = {r["id"] for r in pre_cutoff_sightings(sightings).collect()}
    # "19" fails LENGTH>=4; 1901/modern/null/unparseable are out
    assert got == {1, 2, 3, 4, 5, 6, 7}


def test_referenced_locations_semi_join(spark, frames):
    sightings, loc, _ = frames
    ex = pre_cutoff_sightings(sightings)
    got = {r["id"] for r in referenced_locations(ex, loc).collect()}
    assert got == {10, 11}  # 12 is never referenced


def test_classification_matrix(spark, frames):
    sightings, loc, src = frames
    da = date_analysis(pre_cutoff_sightings(sightings), src, loc)
    cat = {r["sighting_id"]: r["category"] for r in da.collect()}
    assert cat == {
        1: CAT_CENTURY_ONLY,
        2: CAT_3DIGIT_REVIEW,
        3: CAT_ANCIENT,
        4: CAT_2DIGIT_ANCIENT,
        5: CAT_OTHER_REVIEW,
        6: CAT_OTHER_REVIEW,
        7: CAT_UNCLASSIFIED,
    }


def test_date_analysis_columns(spark, frames):
    sightings, loc, src = frames
    da = date_analysis(pre_cutoff_sightings(sightings), src, loc)
    rows = {r["sighting_id"]: r for r in da.collect()}
    r3 = rows[3]
    assert r3["source_name"] == "UFOCAT"
    assert r3["raw_year_str"] == "1850"
    assert r3["raw_year_digits"] == 4
    assert r3["parsed_year"] == 1850
    assert r3["city"] == "paris" and r3["country"] == "france"
    # no '/' in raw -> NULL year decomposition (reference CASE INSTR rule)
    assert rows[6]["raw_year_str"] is None
    assert rows[6]["raw_year_digits"] is None
    # unlocated sighting keeps NULL location context
    assert rows[5]["city"] is None
    # snip is bounded at 200 chars
    assert all(
        len(r["description_snip"]) <= 200
        for r in rows.values()
        if r["description_snip"] is not None
    )


def test_views_and_extract_roundtrip(spark, frames, tmp_path):
    sightings, loc, src = frames
    out = extract_historic(spark, sightings, loc, src, str(tmp_path / "hist"))
    # durable copies == recomputed frames
    assert out["sighting"].count() == 7
    assert {r["id"] for r in out["location"].collect()} == {10, 11}

    views = register_analysis_views(spark, out["date_analysis"])
    assert len(views) == 5
    summary = rows_set(
        spark.table("v_category_summary"),
        ["category", "source_name", "cnt"],
    )
    assert (CAT_CENTURY_ONLY, "UFOCAT", 1) in summary
    assert (CAT_OTHER_REVIEW, "NUFORC", 1) in summary
    assert (CAT_OTHER_REVIEW, "UPDB", 1) in summary
    # v_updb_review: UPDB parsed_year < 1000 (reference
    # extract_historic.py:243-250)
    assert {r["sighting_id"] for r in spark.table("v_updb_review").collect()} == {6}
    assert {r["sighting_id"] for r in spark.table("v_3digit_review").collect()} == {2}
    # timeline is ordered by parsed_year
    years = [r["parsed_year"] for r in spark.table("v_timeline").collect()]
    assert years == sorted(years)
    # parquet read-back matches the returned frame
    reread = spark.read.parquet(str(tmp_path / "hist" / "date_analysis"))
    assert rows_set(reread, ["sighting_id", "category"]) == rows_set(
        out["date_analysis"], ["sighting_id", "category"]
    )
