"""Ingestion dialect parity (S1-S7): each fixture reproduces one reference
source dialect; the Spark reader's rows must equal what the reference
importer's parsing stack (csv.DictReader / json.load) produces for the
same bytes."""

from __future__ import annotations

import csv
import json
import os

import pytest
from pyspark.sql import functions as F

from ufo_dedup_spark.sources.readers import (
    read_gazetteer_tsv,
    read_geldreich_json,
    read_jsonl,
    read_mufon_csv,
    read_nuforc_csv,
    read_ufocat_csv,
    read_updb_csv,
    write_jsonl,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _csv_rows(path):
    """Reference-importer-equivalent parse: csv.DictReader over utf-8."""
    with open(path, encoding="utf-8", errors="replace") as f:
        return list(csv.DictReader(f))


def test_nuforc_multiline_csv_parity(spark):
    """S1: embedded newlines + doubled quotes inside quoted fields."""
    path = f"{FIX}/nuforc_sample.csv"
    expected = _csv_rows(path)
    got = [r.asDict() for r in read_nuforc_csv(spark, path).collect()]
    assert len(got) == len(expected) == 3
    # Spark reads empty CSV fields as NULL; DictReader gives '' — the
    # reference's importers treat both as missing, so compare coalesced
    norm = lambda d: {k: (v if v not in (None, "") else None) for k, v in d.items()}
    for g, e in zip(sorted(got, key=str), sorted(expected, key=str)):
        assert norm(g) == norm(e)
    # the multi-line description round-trips byte-identically
    descs = {g["description"] for g in got}
    assert 'A bright light that\n"hovered", then shot\nacross two lines' in descs


def test_mufon_csv_parity_and_location_unescape(spark):
    """S2: \\,-escaped commas are field CONTENT; the scanner must not split
    them, and the location parser unescapes exactly like the reference."""
    path = f"{FIX}/mufon_sample.csv"
    expected = _csv_rows(path)
    df = read_mufon_csv(spark, path)
    got = [r.asDict() for r in df.collect()]
    assert sorted(got, key=str) == sorted(expected, key=str)

    # reference parse_mufon_location: replace('\\,', ',') then split
    loc = df.select(
        F.split(F.replace(F.col("location"), F.lit("\\,"), F.lit(",")), ",")
        .alias("parts")
    ).collect()
    parsed = {tuple(p.strip() for p in r["parts"]) for r in loc}
    assert ("Newscandia", "MN", "US") in parsed
    assert ("Phoenix", "AZ", "US") in parsed


def test_ufocat_scan_splits_skip_sources(spark):
    """S3+S9: one scan, two dataflows (kept vs NUFORC-origin sidecar)."""
    path = f"{FIX}/ufocat_sample.csv"
    kept, skipped = read_ufocat_csv(spark, path)
    assert kept.count() == 2
    assert skipped.count() == 1
    assert {r["SOURCE"] for r in skipped.collect()} == {"UFOReportCtr"}
    # import-time dedup contract: kept + skipped == raw rows, no overlap
    assert kept.count() + skipped.count() == len(_csv_rows(path))


def test_updb_scan_skips_mufon_nuforc(spark):
    """S4+S9: the 1.9M-row dialect's name-based skip, pushed into the scan."""
    path = f"{FIX}/updb_sample.csv"
    df = read_updb_csv(spark, path)
    names = {r["name"] for r in df.collect()}
    assert names == {"Hatch", "NICAP"}
    expected = [r for r in _csv_rows(path) if r["name"] not in ("MUFON", "NUFORC")]
    assert df.count() == len(expected)


def test_geldreich_wholefile_json_parity(spark):
    """S5: utf-8-sig whole-file JSON, named top-level array, list-valued
    location fields."""
    path = f"{FIX}/geldreich_sample.json"
    with open(path, encoding="utf-8-sig") as f:
        expected = json.load(f)["Majestic Timeline"]
    df = read_geldreich_json(spark, path)
    assert df.count() == len(expected) == 3
    dates = {r["date"] for r in df.collect()}
    assert dates == {e["date"] for e in expected}
    # list-valued location joins like the reference importer
    # (import_geldreich.py:109-112: ', '.join)
    from ufo_dedup_spark.sources.readers import joined_list_col

    locs = {
        r["date"]: r["loc"]
        for r in df.select(
            "date", joined_list_col(F.col("location")).alias("loc")
        ).collect()
    }
    assert locs["Summer 1947"] == "ITALY, ROME"
    assert locs["6/24/1947"] == "Mount Rainier, WA"  # plain strings pass through


def test_gazetteer_tsv_altname_explosion(spark):
    """S6: positional TSV -> typed rows; alternate names become extra city
    keys with the same coordinates (geocode.py:106-118)."""
    df = read_gazetteer_tsv(spark, f"{FIX}/gazetteer_sample.tsv")
    rows = {r["city"]: r for r in df.collect()}
    assert {"PHOENIX", "FENIX", "PHX", "ROME", "ROMA", "ROM"} <= set(rows)
    assert rows["PHX"]["lat"] == pytest.approx(33.44838)
    assert rows["PHX"]["country"] == "US" and rows["PHX"]["admin1"] == "AZ"
    assert rows["ROMA"]["pop"] == 2318895
    # exploded rows feed geocode_cascade directly
    from ufo_dedup_spark.operators.geocode import geocode_cascade

    loc = spark.createDataFrame(
        [(1, "Fenix", "AZ", "US")], "id int, city string, state string, country string"
    )
    out = geocode_cascade(loc, df).collect()[0]
    assert out["geocode_method"] == "exact"
    assert out["lat"] == pytest.approx(33.44838)


def test_jsonl_sidecar_roundtrip(spark, tmp_path):
    """S7: JSONL scan + sink round-trip preserves rows and NULLs."""
    src = read_jsonl(spark, f"{FIX}/enrichment_sample.jsonl")
    assert src.count() == 2
    rows = {r["city"]: r for r in src.collect()}
    assert rows["SEATTLE"]["hynek"] == "DD"
    assert rows["MESA"]["vallee"] == "AN1"

    out_dir = str(tmp_path / "sidecar")
    write_jsonl(src, out_dir)
    back = read_jsonl(spark, out_dir)
    assert sorted((r["city"], r["hynek"]) for r in back.collect()) == sorted(
        (r["city"], r["hynek"]) for r in src.collect()
    )
