"""SparkSession construction with scale-oriented defaults.

Single place where engine-wide Spark configuration lives so tests, bench.py
and the driver contract all run with the same plan-shaping settings:
AQE on (runtime coalesce + skew-join splitting), Arrow on (pandas UDF
transfer), and a shuffle-partition count sized to the parallelism level.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so executors can import it regardless of cwd.

    Local equivalent of ``spark-submit --py-files``: pandas UDFs are
    cloudpickled by reference to the module, so worker processes must be able
    to ``import ufo_dedup_spark`` themselves.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "ufo_dedup_spark_pyfiles.zip")
    # write-to-unique-temp + atomic rename: two sessions building
    # concurrently on one host (parallel pytest workers, two drivers) must
    # never observe a half-written zip at the shared final path. os.replace
    # is atomic within a filesystem, so readers see either the old complete
    # zip or the new complete zip.
    fd, tmp = tempfile.mkstemp(
        suffix=".zip", prefix="ufo_dedup_spark_pyfiles_",
        dir=tempfile.gettempdir(),
    )
    try:
        with os.fdopen(fd, "wb") as fobj, zipfile.ZipFile(fobj, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp, out)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return out


def _aqe_flag() -> str:
    """Normalized SPARK_GRAFT_AQE env value ('true'/'false').

    Validated here (like SPARK_GRAFT_SHUFFLE_PARTITIONS) so a typo'd value
    fails with a clear message instead of an opaque Spark
    IllegalArgumentException at session build.
    """
    raw = os.environ.get("SPARK_GRAFT_AQE", "true").strip().lower()
    if raw in ("true", "1", "yes", "on", ""):
        return "true"
    if raw in ("false", "0", "no", "off"):
        return "false"
    raise ValueError(
        f"SPARK_GRAFT_AQE must be a boolean (true/false/1/0/yes/no/on/off); "
        f"got {raw!r}"
    )


def build_session(
    app_name: str = "ufo-dedup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to 2x the local core count — small enough
    that AQE coalescing is cheap at test scale, large enough to exercise
    parallelism; a real cluster deployment overrides via ``extra_conf``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    # local-cluster[numWorkers,coresPerWorker,memPerWorkerMB]: separate
    # executor JVMs on this host — the in-sandbox analog of a multi-executor
    # cluster (each worker gets its own heap, GC, shuffle path and Python
    # worker fleet). Total cores = workers x coresPerWorker.
    lc = None
    if master.startswith("local-cluster["):
        parts = master[master.index("[") + 1 : -1].split(",")
        lc = (int(parts[0]), int(parts[1]), int(parts[2]))
        cores = lc[0] * lc[1]
    else:
        # local[K], local[*], and local[K,maxFailures] forms: only the
        # leading token before an optional comma is the thread count
        n = master[master.index("[") + 1 : -1] if "[" in master else "8"
        n = n.split(",", 1)[0].strip()
        try:
            cores = (os.cpu_count() or 8) if n == "*" else int(n)
        except ValueError:
            cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "").strip()
        if env_sp:
            # job-level override: on a real cluster shuffle.partitions is a
            # JOB config that stays fixed while the executor count varies —
            # scaling_bench pins it at both levels so the physical plan is
            # identical and only the parallelism grant changes.
            # '0' / negative = "use the per-level core-count default"
            # (scaling_bench's convention); non-numeric is a config error.
            try:
                env_val = int(env_sp)
            except ValueError:
                raise ValueError(
                    f"SPARK_GRAFT_SHUFFLE_PARTITIONS must be an integer "
                    f"(got {env_sp!r}); unset it or use 0 for the "
                    f"core-count default"
                ) from None
            if env_val > 0:
                shuffle_partitions = env_val
        if shuffle_partitions is None:
            # one shuffle partition per core: AQE splits skewed/huge
            # partitions upward at runtime, so oversizing here only buys
            # task overhead
            shuffle_partitions = max(8, cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # SPARK_GRAFT_AQE=false disables adaptive execution for fixed-shape
        # jobs (every AQE stage boundary is a driver re-planning barrier;
        # a pipeline whose partition counts are pinned can trade runtime
        # re-optimization for fewer driver round-trips)
        .config("spark.sql.adaptive.enabled", _aqe_flag())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: keep coalescePartitions.parallelismFirst at its default
        # (true). Size-first coalescing collapses small-in-bytes shuffles to
        # one partition, which serializes CPU-heavy post-shuffle work
        # (exploded LSH buckets, pandas-UDF verification) — measured 2-4x
        # slower on the dedup pipeline.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # collect_list aggregations over millions of small groups: the
        # default ObjectHashAggregate fallback (128 groups) degrades to a
        # full sort — raise it so bucket-collection stays hash-based
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # SPARK_GRAFT_BROADCAST_THRESHOLD: job-level override (bytes or
        # Spark size string). Scale probes use it to put moderate-sized
        # runs into the beyond-broadcast join regime that multi-million-
        # doc corpora reach naturally; unset = the engine default.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get(
                "SPARK_GRAFT_BROADCAST_THRESHOLD", str(64 * 1024 * 1024)
            ),
        )
        # single-JVM local mode: the driver heap IS the executor heap, so
        # size it for the concurrent-task count, not a fixed number — at 32
        # tasks an 8g heap leaves ~150MB of unified memory per task and the
        # collect_list / sort stages spill (measured ~9% wall-clock at 100k
        # docs). ~600MB/core with an 8g floor: 8g up to 13 cores, ~19g at
        # 32, and a small-core host never demands more heap than it would
        # have under the old 8g default. In local-cluster mode the driver
        # executes no tasks, so a flat 4g suffices (executors carry the
        # per-core grant instead). SPARK_GRAFT_DRIVER_MEM overrides.
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM",
                "4g" if lc else f"{max(8 * 1024, 600 * cores)}m",
            ),
        )
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""),
        )
        # FAIR across job pools: concurrent driver threads (checkpoint
        # bucket jobs, parallel query branches) each submit to their own
        # pool and fair-share the cluster instead of queueing FIFO behind a
        # straggler; single-job workloads are unaffected
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if lc:
        # one executor per worker at full worker capacity, and the exact
        # interpreter running the driver for executor-side Python workers
        # (worker JVMs inherit a minimal environment)
        builder = (
            builder.config(
                "spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", f"{lc[2]}m"),
            )
            .config("spark.pyspark.python", sys.executable)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.addPyFile(_package_zip())
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Read the driver testdata parquet tables and register temp views.

    Returns {name: DataFrame}. Tables: region nation customer supplier part
    orders lineitem events documents embeddings (TESTDATA.md).
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
