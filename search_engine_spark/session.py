"""SparkSession factory tuned for the search-engine workload.

Local testing runs ``local[N]`` but every knob is chosen for cluster scale:
AQE on (skew-join splitting + partition coalescing), Arrow for all pandas
UDF exchange, shuffle partitions sized to cores locally (on a real cluster
set ``spark.sql.shuffle.partitions`` ~= 2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "search-engine-spark",
              cores: int | str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting — the safety net for
        # head-term skew beyond our explicit salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere: pandas UDFs and toPandas go through Arrow batches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep timestamps deterministic across environments.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    n_shuffle = shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS")
    if n_shuffle:
        builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    elif cores != "*":
        builder = builder.config("spark.sql.shuffle.partitions", str(2 * int(cores)))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
