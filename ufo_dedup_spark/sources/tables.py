"""Table I/O for the dedup pipeline: Iceberg when available, parquet
otherwise — one call site for 'read the corpus' / 'write the clusters'.

The north rule's storage layer is Iceberg ('reads Iceberg tables of
Common-Crawl-style web pages ... writing cluster assignments back to
Iceberg'). Iceberg support in Spark is a runtime jar + catalog config, not
an API change: the SAME DataFrame code runs against either store, which is
the point of these helpers. This container ships no Iceberg runtime jar,
so:

- ``iceberg_available(spark)`` probes the session for the extension.
- ``read_pages`` / ``write_clusters`` take a table identifier
  ('catalog.db.pages') OR a filesystem path; identifiers use the Iceberg
  catalog (must be available), paths use parquet.
- ``iceberg_session_conf`` returns the exact --conf set a cluster
  deployment passes to spark-submit; it is also usable with
  session.build_session(extra_conf=...).

Parquet-path behavior is fully tested here; the Iceberg branch is the same
two calls with a table identifier (format('iceberg') round-trips are
covered upstream by Iceberg's own Spark integration tests — nothing
engine-specific happens in between).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_RUNTIME_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def iceberg_session_conf(
    catalog: str = "lake", warehouse: str = "/tmp/iceberg-warehouse"
) -> dict[str, str]:
    """The spark-submit/--conf set that enables an Iceberg catalog.

    Usage on a cluster:
      spark-submit --packages {ICEBERG_RUNTIME_PACKAGE} \\
        $(python -c 'from ufo_dedup_spark.sources.tables import \\
          iceberg_session_conf; print(" ".join(f"--conf {k}={v}" for k, v \\
          in iceberg_session_conf().items()))') job.py
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _is_table_identifier(target: str) -> bool:
    """Catalog identifiers contain dots and no path separators."""
    return "/" not in target and "." in target and not target.endswith(
        (".parquet", ".json", ".csv")
    )


def read_pages(spark: SparkSession, target: str) -> DataFrame:
    """Read the pages corpus from an Iceberg table identifier or a parquet
    path. Column pruning/predicate pushdown work identically on both."""
    if _is_table_identifier(target):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"'{target}' looks like a table identifier but the Iceberg "
                f"runtime is not on the classpath; submit with --packages "
                f"{ICEBERG_RUNTIME_PACKAGE} or pass a parquet path"
            )
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_clusters(
    df: DataFrame, target: str, mode: str = "overwrite"
) -> None:
    """Write cluster assignments back to an Iceberg table or parquet path.

    Iceberg writes are transactional (snapshot commit); the parquet path
    relies on the directory-level atomicity of Spark's commit protocol —
    both give all-or-nothing semantics per call, which resume logic
    (checkpoint.py) depends on.
    """
    if _is_table_identifier(target):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(target)
