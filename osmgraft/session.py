"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (one JVM, N threads); on a real
cluster every knob here is still correct — AQE, Arrow, and a
shuffle-partition count sized by the caller.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """min(32g, ~70% of MemAvailable) — generous where the host allows,
    spill-not-OOM where it doesn't. SPARK_GRAFT_DRIVER_MEM overrides."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(32, int(avail_gb * 0.7)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "osmgraft",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls local-mode parallelism (``local[cores]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions default to the core
    count — at cluster scale callers pass an explicit value sized to the
    input (we rely on AQE coalescing to fix over-partitioning at runtime).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        shuffle_default = int(env) if env else 32
    else:
        master = f"local[{cores}]"
        shuffle_default = cores
    if shuffle_partitions is None:
        shuffle_partitions = shuffle_default

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver heap IS the executor heap for all N
        # worker threads; 8g at local[32] measurably thrashes G1
        # (42s -> 17s pipeline effect), so default generously — but cap
        # at ~70% of the host's available RAM so small machines spill
        # instead of driving the OS into OOM
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
