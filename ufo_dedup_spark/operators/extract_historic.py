"""Pre-cutoff historic extract with a derived date_analysis table + views.

Spark-first analog of the reference's extract_historic.py (reference
extract_historic.py:99-260): a filtered sighting+location subset written to
a standalone location, a `date_analysis` classification table derived
entirely from Column expressions (the reference derives it in SQL and then
applies five ordered UPDATE classifications, extract_historic.py:131-214),
and the five analysis views (extract_historic.py:216-260) registered as
temp views over the derived table.

The classification cascade is ONE case expression instead of five ordered
UPDATEs — the reference's rules are mutually exclusive by construction
(each targets a disjoint (source, digit-count, raw-year) slice, with
`other_source_review` sweeping only rows no earlier rule touched), so the
first-match CASE semantics reproduce the UPDATE sequence exactly.

At 100 TB: the extract is a partition-pruned filter -> parquet/Iceberg
write; date_analysis is a projection plus one broadcast join (source dim)
and one equi-join (location) — no aggregation until the summary view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CUTOFF_YEAR = 1901

# the reference's category labels (extract_historic.py:166-214)
CAT_CENTURY_ONLY = "ufocat_century_only"
CAT_3DIGIT_REVIEW = "ufocat_3digit_review"
CAT_ANCIENT = "ufocat_ancient"
CAT_2DIGIT_ANCIENT = "ufocat_2digit_ancient"
CAT_OTHER_REVIEW = "other_source_review"
CAT_UNCLASSIFIED = "unclassified"


def parsed_year_col(date_event) -> F.Column:
    """CAST(SUBSTR(date_event, 1, 4) AS INTEGER), NULL-safe under ANSI
    (reference extract_historic.py:109, 154)."""
    return F.substring(date_event, 1, 4).try_cast("int")


def raw_year_col(date_event_raw) -> F.Column:
    """The year portion of the raw date: everything before the first '/'
    (reference extract_historic.py:144-149); NULL when no '/' present."""
    pos = F.instr(date_event_raw, "/")
    return F.when(
        date_event_raw.isNotNull() & (pos > 0),
        F.substring(date_event_raw, F.lit(1), pos - 1),
    )


def classify_category(source_name, raw_year_digits, raw_year_str,
                      parsed_year) -> F.Column:
    """The five ordered classification rules as one first-match CASE
    (reference extract_historic.py:166-214)."""
    is_ufocat = source_name == "UFOCAT"
    return (
        F.when(
            is_ufocat & (raw_year_digits == 2) & (raw_year_str == "19"),
            F.lit(CAT_CENTURY_ONLY),
        )
        .when(is_ufocat & (raw_year_digits == 3), F.lit(CAT_3DIGIT_REVIEW))
        .when(
            is_ufocat & (raw_year_digits == 4) & (parsed_year < CUTOFF_YEAR),
            F.lit(CAT_ANCIENT),
        )
        .when(
            is_ufocat & (raw_year_digits == 2) & (raw_year_str != "19"),
            F.lit(CAT_2DIGIT_ANCIENT),
        )
        .when(~is_ufocat, F.lit(CAT_OTHER_REVIEW))
        .otherwise(F.lit(CAT_UNCLASSIFIED))
    )


def pre_cutoff_sightings(
    sighting: DataFrame, cutoff_year: int = CUTOFF_YEAR
) -> DataFrame:
    """The extract filter (reference extract_historic.py:99-108): events
    dated, with a >=4-char date whose year parses into [1, cutoff)."""
    y = parsed_year_col(F.col("date_event"))
    return sighting.filter(
        F.col("date_event").isNotNull()
        & (F.length("date_event") >= 4)
        & y.between(1, cutoff_year - 1)
    )


def referenced_locations(
    extracted: DataFrame, location: DataFrame
) -> DataFrame:
    """Locations referenced by the extract (reference
    extract_historic.py:116-128) — a semi-join, not a collected id set."""
    ids = extracted.select(
        F.col("location_id").alias("id")
    ).filter(F.col("location_id").isNotNull()).distinct()
    return location.join(ids, on="id", how="left_semi")


def date_analysis(
    extracted: DataFrame,
    source_database: DataFrame,
    location: DataFrame,
) -> DataFrame:
    """The derived classification table (reference
    extract_historic.py:131-214): per-sighting raw-year decomposition +
    parsed year + location context + category.

    source_database (id, name) is a tiny dim -> broadcast; location joins
    on the extract's location_id (left: unlocated sightings keep NULLs).
    """
    raw_year = raw_year_col(F.col("date_event_raw"))
    base = (
        extracted.join(
            F.broadcast(
                source_database.select(
                    F.col("id").alias("_sdid"), F.col("name").alias("source_name")
                )
            ),
            extracted["source_db_id"] == F.col("_sdid"),
            "inner",
        )
        .join(
            location.select(
                F.col("id").alias("_lid"), "city", "state", "country"
            ),
            extracted["location_id"] == F.col("_lid"),
            "left",
        )
        .select(
            F.col("id").alias("sighting_id"),
            "source_name",
            "date_event",
            "date_event_raw",
            raw_year.alias("raw_year_str"),
            F.length(raw_year).alias("raw_year_digits"),
            parsed_year_col(F.col("date_event")).alias("parsed_year"),
            "city",
            "state",
            "country",
            F.substring("description", 1, 200).alias("description_snip"),
        )
    )
    return base.withColumn(
        "category",
        classify_category(
            F.col("source_name"),
            F.col("raw_year_digits"),
            F.col("raw_year_str"),
            F.col("parsed_year"),
        ),
    ).withColumn("corrected_year", F.lit(None).cast("int")).withColumn(
        "notes", F.lit(None).cast("string")
    )


def register_analysis_views(spark: SparkSession, da: DataFrame) -> list[str]:
    """The five analysis views (reference extract_historic.py:216-260) as
    temp views over the date_analysis frame."""
    da.createOrReplaceTempView("date_analysis")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_category_summary AS
        SELECT category, source_name, COUNT(*) AS cnt,
               MIN(parsed_year) AS min_year, MAX(parsed_year) AS max_year
        FROM date_analysis
        GROUP BY category, source_name
        ORDER BY category, source_name
        """
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMP VIEW v_3digit_review AS
        SELECT sighting_id, raw_year_str, parsed_year,
               city, state, country, description_snip, category, notes
        FROM date_analysis
        WHERE category = '{CAT_3DIGIT_REVIEW}'
        ORDER BY parsed_year
        """
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMP VIEW v_century_only AS
        SELECT sighting_id, date_event, date_event_raw,
               city, state, country, description_snip
        FROM date_analysis
        WHERE category = '{CAT_CENTURY_ONLY}'
        ORDER BY state, city
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_updb_review AS
        SELECT sighting_id, parsed_year, date_event, date_event_raw,
               city, state, country, description_snip, notes
        FROM date_analysis
        WHERE source_name = 'UPDB' AND parsed_year < 1000
        ORDER BY parsed_year
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW v_timeline AS
        SELECT sighting_id, source_name, parsed_year, category,
               raw_year_str, raw_year_digits, city, state, country,
               SUBSTR(description_snip, 1, 80) AS desc_short,
               corrected_year, notes
        FROM date_analysis
        ORDER BY parsed_year, source_name
        """
    )
    return [
        "v_category_summary",
        "v_3digit_review",
        "v_century_only",
        "v_updb_review",
        "v_timeline",
    ]


def extract_historic(
    spark: SparkSession,
    sighting: DataFrame,
    location: DataFrame,
    source_database: DataFrame,
    out_dir: str,
    cutoff_year: int = CUTOFF_YEAR,
) -> dict[str, DataFrame]:
    """Full analog of reference extract_historic.extract(): write the
    filtered subset + the derived table as parquet under ``out_dir`` and
    register the analysis views. Returns the written frames (read back, so
    downstream consumers see the durable copies)."""
    extracted = pre_cutoff_sightings(sighting, cutoff_year)
    extracted.write.mode("overwrite").parquet(f"{out_dir}/sighting")
    extracted = spark.read.parquet(f"{out_dir}/sighting")

    locs = referenced_locations(extracted, location)
    locs.write.mode("overwrite").parquet(f"{out_dir}/location")
    locs = spark.read.parquet(f"{out_dir}/location")

    source_database.write.mode("overwrite").parquet(f"{out_dir}/source_database")

    da = date_analysis(extracted, source_database, locs)
    da.write.mode("overwrite").parquet(f"{out_dir}/date_analysis")
    da = spark.read.parquet(f"{out_dir}/date_analysis")

    register_analysis_views(spark, da)
    return {"sighting": extracted, "location": locs, "date_analysis": da}
