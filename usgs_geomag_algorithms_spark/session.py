"""SparkSession factory with the engine's required configuration.

Pinned UTC session timezone (oracle comparability), AQE on (runtime skew
handling at cluster scale), Arrow on (vectorized pandas-UDF boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "usgs_geomag_algorithms_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    Parameters
    ----------
    cores:
        local[N] parallelism; default from ``SPARK_GRAFT_CPUS`` env or ``*``.
    shuffle_partitions:
        default = cores (local mode: over-partitioning tiny data wastes task
        launches; a real cluster run would set this to ~2-3x total cores).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_shuffle = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_shuffle = cores
    if shuffle_partitions is not None:
        n_shuffle = shuffle_partitions

    # real-cluster override: point SPARK_GRAFT_MASTER at a standalone
    # master (spark://host:7077) and the SAME engine/bench code runs on
    # separate executor JVMs instead of local-mode threads; the requested
    # core count becomes the app's core cap (spark.cores.max), so the
    # N-vs-4N-executor scaling evidence uses genuine multi-executor runs
    # (tools/bench_standalone.py).
    # Under spark-submit the JVM gateway already exists and carries the
    # submit-time --master; calling builder.master() would silently
    # OVERRIDE it back to local mode (the driver would run the whole job
    # in-process while the cluster sits idle). Detect that launch path
    # and leave the master alone so `spark-submit --master spark://...
    # --py-files engine.zip jobs/run_*.py` behaves as the flag says.
    submit_managed = "PYSPARK_GATEWAY_PORT" in os.environ
    if submit_managed:
        master = None

    cluster_master = os.environ.get("SPARK_GRAFT_MASTER")
    cluster_conf: dict = {}
    if cluster_master:
        master = cluster_master
        cluster_conf["spark.cores.max"] = str(n_shuffle)
        cluster_conf["spark.executor.cores"] = os.environ.get(
            "SPARK_EXECUTOR_CORES", "1"
        )
        cluster_conf["spark.executor.memory"] = os.environ.get(
            "SPARK_EXECUTOR_MEMORY", "8g"
        )
        pyfiles = os.environ.get("SPARK_GRAFT_PYFILES")
        if pyfiles:
            cluster_conf["spark.submit.pyFiles"] = pyfiles

    # shuffle/spill scratch: prefer tmpfs — the sandbox stand-in for the
    # local NVMe a real executor would have (the VM's /tmp disk throttles
    # shuffle writes ~2x)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"

    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in cluster_conf.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(
        os.environ.get("SPARK_GRAFT_LOG_LEVEL", "WARN")
    )
    return spark
