"""North-rule deployment contract: the pipeline runs via REAL spark-submit
--py-files (separate process, package imported from the shipped zip, not
the repo checkout), and table I/O degrades gracefully without Iceberg."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return p if os.path.exists(p) else None
    except ImportError:
        return None


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("spark-submit not available")

    sys.path.insert(0, REPO)
    from ufo_dedup_spark.session import _package_zip

    zip_path = _package_zip()
    out_dir = str(tmp_path / "clusters")

    env = dict(os.environ)
    # the whole point: the driver/executors must import the package from
    # the --py-files zip, NOT from the repo working directory
    env.pop("PYTHONPATH", None)

    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_pipeline.py"),
            "--synth-rows", "600",
            "--out", out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — import must come from the zip
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    status = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert status["status"] == "ok"
    assert status["rows_written"] == 600  # every doc gets a cluster row


def test_tables_parquet_roundtrip(spark, tmp_path):
    from ufo_dedup_spark.sources.tables import read_pages, write_clusters

    df = spark.range(10).withColumnRenamed("id", "cluster_id")
    out = str(tmp_path / "t.out")
    write_clusters(df, out)
    assert read_pages(spark, out).count() == 10


def test_tables_iceberg_identifier_guard(spark):
    """A table identifier without the Iceberg runtime must fail with the
    actionable message, not a cryptic classpath error."""
    from ufo_dedup_spark.sources.tables import (
        iceberg_available,
        read_pages,
    )

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; guard not reachable")
    with pytest.raises(RuntimeError, match="--packages"):
        read_pages(spark, "lake.db.pages")
