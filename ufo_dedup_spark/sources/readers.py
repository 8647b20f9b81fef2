"""Source scans (S1-S7): the reference's five ingestion dialects as Spark
readers, plus the JSONL sidecar sink/scan.

Dialect -> option-set mapping (each pinned by a fixture parity test in
tests/test_sources.py against the reference importer's csv/json parsing):

- NUFORC CSV (import_nuforc.py): quoted fields containing embedded
  newlines -> multiLine + doubled-quote escape.
- MUFON CSV (import_mufon.py): standard CSV; the backslash-escaped commas
  live INSIDE field values and are handled by the location parser, not the
  scanner (reference does the same: csv.DictReader + str.replace).
- UFOCAT CSV (import_ufocat.py): plain header CSV, 55 columns; the
  SOURCE-based skip happens at scan time (S9: import-time source filter).
- UPDB CSV (import_updb.py): plain header CSV at 1.9M rows; name-based
  skip at scan time. One scan, two consumers (kept vs skipped-for-sidecar)
  is the reference's dataflow split.
- UFO-search/geldreich JSON (import_geldreich.py): ONE whole-file JSON
  document (utf-8-sig BOM) with a named top-level array -> multiLine JSON
  scan + explode.
- GeoNames gazetteer TSV (geocode.py:79-118): headerless tab-separated,
  positional columns, alternate-names exploded into extra city rows.
- Enrichment JSONL sidecar (import_ufocat.py:19, enrich.py): default
  line-delimited JSON scan/sink.

At scale every reader is a plain distributed file scan; the only
single-file caveat is the whole-file JSON (multiLine JSON cannot split one
file) — the reference's input is one 55k-record file, and a 100 TB corpus
would arrive as many files, which this reader parallelizes over naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Import-time skips (S9) — reference import_ufocat.py:25 / import_updb.py:19
UFOCAT_SKIP_SOURCES = ("UFOReportCtr",)
UPDB_SKIP_SOURCES = ("MUFON", "NUFORC")

# GeoNames cities15000 positional layout (geocode.py:92-104)
_GAZ_COLS = {
    "name": 1,
    "asciiname": 2,
    "alternatenames": 3,
    "lat": 4,
    "lng": 5,
    "country": 8,
    "admin1": 10,
    "pop": 14,
}


def read_nuforc_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: header CSV with quoted multi-line description fields."""
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_mufon_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: header CSV; `\\,`-escaped commas are value content (handled by
    parse_mufon_location), embedded newlines are quoted."""
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_ufocat_csv(
    spark: SparkSession, path: str, skip_sources=UFOCAT_SKIP_SOURCES
) -> tuple[DataFrame, DataFrame]:
    """S3+S9: one scan, split into (kept, skipped) by SOURCE — the skipped
    side feeds the enrichment sidecar (import_ufocat.py:110-130). Both
    returned frames share the scan; the filter pushes to the reader."""
    raw = spark.read.option("header", True).csv(path)
    kept = raw.filter(~F.col("SOURCE").isin(*skip_sources))
    skipped = raw.filter(F.col("SOURCE").isin(*skip_sources))
    return kept, skipped


def read_updb_csv(
    spark: SparkSession, path: str, skip_sources=UPDB_SKIP_SOURCES
) -> DataFrame:
    """S4+S9: plain CSV scan with the import-time name skip pushed into the
    scan filter (import_updb.py:70-76)."""
    raw = spark.read.option("header", True).csv(path)
    return raw.filter(~F.trim(F.coalesce(F.col("name"), F.lit(""))).isin(*skip_sources))


def read_geldreich_json(
    spark: SparkSession, path: str, top_key: str = "Majestic Timeline"
) -> DataFrame:
    """S5: whole-file JSON (utf-8-sig) -> explode the named top-level array
    into one row per record. The encoding option is deliberately UNSET:
    with multiLine=true Spark auto-detects the encoding from the BOM (an
    explicit 'UTF-8' would make the BOM corrupt the first token).
    List-valued fields survive as-is for the location normalizer."""
    doc = spark.read.option("multiLine", True).json(path)
    return doc.select(F.explode(F.col(f"`{top_key}`")).alias("r")).select("r.*")


def joined_list_col(c):
    """Normalize a mixed string-or-list JSON field: Spark's schema
    inference widens such fields to string, leaving list values as JSON
    text ('["ITALY", "ROME"]'); the reference joins lists with ', '
    (import_geldreich.py:109-112). Non-list values pass through."""
    arr = F.from_json(c, "array<string>")
    return F.when(arr.isNotNull(), F.array_join(arr, ", ")).otherwise(c)


def read_gazetteer_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S6: headerless GeoNames TSV -> typed (city, admin1, country, lat,
    lng, pop) rows, alternate names exploded into additional city rows
    (geocode.py:106-118: ascii, length > 1). Ready for geocode_cascade."""
    raw = spark.read.option("sep", "\t").option("header", False).csv(path)

    def col(name):
        return F.col(f"_c{_GAZ_COLS[name]}")

    names = F.array_distinct(
        F.concat(
            F.array(F.upper(F.trim(col("name"))), F.upper(F.trim(col("asciiname")))),
            F.filter(
                F.transform(
                    F.split(F.coalesce(col("alternatenames"), F.lit("")), ","),
                    lambda a: F.upper(F.trim(a)),
                ),
                lambda a: (F.length(a) > 1) & a.rlike(r"^[\x00-\x7F]+$"),
            ),
        )
    )
    return (
        raw.select(
            F.explode(names).alias("city"),
            F.upper(F.trim(col("admin1"))).alias("admin1"),
            F.upper(F.trim(col("country"))).alias("country"),
            col("lat").cast("double").alias("lat"),
            col("lng").cast("double").alias("lng"),
            F.coalesce(col("pop").cast("long"), F.lit(0)).alias("pop"),
        )
        .filter(F.col("city") != "")
    )


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S7 scan: line-delimited JSON (the enrichment sidecar format)."""
    return spark.read.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 sink: line-delimited JSON, partition-parallel."""
    df.write.mode(mode).json(path)
