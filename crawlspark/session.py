"""SparkSession factory for crawlspark.

Local testing runs on ``local[N]`` but every knob is chosen for a
multi-executor cluster at 100 TB: AQE on (runtime skew-join + coalesce),
Arrow for every pandas_udf/mapInPandas boundary, and shuffle partitions
sized to the parallelism level instead of Spark's static 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crawlspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cores`` controls local parallelism; shuffle partitions default to
    2x cores locally (on a real cluster you'd size to executors x cores
    and let AQE coalesce).
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # start AQE from a high partition count and let it coalesce DOWN:
        # big BFS levels keep parallelism (measured +9% on the 100M probe —
        # smaller sort buffers relieve single-JVM GC pressure), small levels
        # still collapse to few partitions
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(8 * cores, 128)))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # single-JVM local mode concentrates every task's Arrow JNI-critical
        # sections in one heap; G1's GCLocker then starves allocations under
        # load (measured: 100M-doc probe crashes at 32 threads without
        # these).  Multi-executor clusters don't hit this — each executor
        # carries a handful of tasks.  Larger G1 regions keep Arrow's 4-32MB
        # buffers out of the humongous path; the retry bump is the JDK's
        # documented mitigation for GCLocker-starved allocation.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:G1HeapRegionSize=32m -XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=100",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
