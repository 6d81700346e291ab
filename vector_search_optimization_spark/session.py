"""SparkSession factory.

The reference runs single-process pandas (SURVEY §4.1); this engine targets a
multi-executor cluster. Defaults below are sized for the local[N] test harness
but every knob is overridable so the same entry points run on a 1000-executor
cluster: AQE handles runtime re-planning (skew joins, partition coalescing),
Arrow is enabled for the pandas-UDF slow path, and the session timezone is
pinned to UTC so results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "vector_search_optimization_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster, pass ``master=None`` with external submit configs; in
    tests we run ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitions default to
    the core count locally — on a cluster AQE coalesces from a higher initial
    number, so callers should raise it (rule of thumb: 2-3x total cores).
    """
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver's events.parquet carries TIMESTAMP(NANOS) — read as
        # long, converted to timestamp in sources.readers (micros, like duckdb)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
