"""SparkSession factory with the engine's scale-oriented defaults.

Designed for a 1000-executor cluster; the sandbox runs local[N]. Every
knob here is the one you'd set at 100 TB: AQE on (runtime re-plan + skew
join splitting), Arrow transfers on (all our UDFs are pandas/Arrow
vectorized), shuffle partitions sized to cores locally (cluster: 2-3x
total cores), and broadcast join threshold left to AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sparklucene", cores: int | None = None,
              shuffle_partitions: int | None = None,
              serving: bool = False) -> SparkSession:
    """``serving=True`` tunes for query latency: AQE off (the query-path
    shuffle is tiny and sized explicitly by search(), so adaptive
    stage-by-stage execution only adds scheduling latency). Builds want
    the default (AQE on)."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARKLUCENE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    if serving:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    return spark
