"""Explicit StructType schemas for every engine table.

Mirrors the reference's fixed declared schemas (create_schema.py in the
reference repo) re-typed for Spark, plus the north-rule web-page input table
(BASELINE.json input_hint) and the engine's output tables.

Design notes (SURVEY.md §1.3):
- ``date_event`` stays StringType: the reference stores variable-precision
  ISO-8601 *prefixes* ("1957", "1985-07", "2005-06-15T23:00") and all blocking
  keys are SUBSTR-based. A derived typed ``date_day`` column exists purely for
  partition pruning.
- ids are deterministic (xxhash64 of natural keys), never
  monotonically_increasing_id(), so re-runs and resumes are stable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# North-rule input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Planted ground truth sidecars emitted by synth.py.
TRUTH_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)
TRUTH_CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster_id", T.LongType(), False),
    ]
)

# Reference-parity fact/dim tables (subset actually exercised by dedup;
# full 42-col sighting schema lives in the reference's create_schema.py).
SIGHTING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("source_db_id", T.IntegerType(), False),
        T.StructField("date_event", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("source_ref", T.StringType(), True),
        T.StructField("location_id", T.LongType(), True),
        T.StructField("shape", T.StringType(), True),
        T.StructField("hynek_class", T.StringType(), True),
        T.StructField("vallee_class", T.StringType(), True),
        T.StructField("raw_json", T.StringType(), True),
    ]
)

LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("raw_text", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("geoname_id", T.LongType(), True),
        T.StructField("geocode_src", T.StringType(), True),
    ]
)

# Scored candidate-pair edge table (reference create_schema.py duplicate_candidate;
# invariant id_a < id_b, unique (id_a, id_b), first method to claim a pair wins).
PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("method", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("cluster_id", T.LongType(), False),
    ]
)
