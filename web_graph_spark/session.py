"""SparkSession factory with scale-aware defaults.

Local mode here stands in for a multi-executor cluster; every config
below is the one we would ship in ``spark-submit --py-files`` form on a
1000-executor cluster (AQE, Arrow, skew join, shuffle sizing).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Repo root (parent of this package) — must reach executor Python
# workers.  On a real cluster this is `spark-submit --py-files wgs.zip`
# (see bench/submit docs); in local mode the workers inherit
# PYTHONPATH from the driver environment, so we pin it here.
_PKG_ROOT = str(Path(__file__).resolve().parent.parent)


def _ensure_pythonpath() -> None:
    pp = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PKG_ROOT + (os.pathsep + pp if pp else "")
        )


def get_spark(app: str = "web_graph_spark", cores: int | None = None,
              shuffle_partitions: int | None = None, ui: bool = False,
              extra: dict | None = None) -> SparkSession:
    _ensure_pythonpath()
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local rule of thumb: ~cores; on a real cluster this is sized
        # so a shuffle partition stays ≲ executor memory / 4 (AQE
        # coalescing then trims small ones at runtime).
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
