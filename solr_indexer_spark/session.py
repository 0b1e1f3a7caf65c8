"""SparkSession factory with the engine's required configuration.

Local-mode testing uses ``local[N]``; production is spark-submit on a
multi-executor cluster — nothing here assumes a single node.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so executors can import it — the local-mode
    equivalent of ``spark-submit --py-files solr_indexer_spark.zip``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "solr_indexer_spark_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return zpath


def get_spark(
    app_name: str = "solr_indexer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - UTC session timezone (oracle comparisons are UTC-naive).
    - AQE on: runtime coalescing + skew handling for the join stages.
    - Arrow on: every Python-side stage is a vectorized pandas UDF.
    - shuffle partitions sized to the core count, not the 200 default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst deliberately stays at Spark's default
        # (true). r7 A/B: forcing size-based coalescing
        # (parallelismFirst=false, 64m advisory) coalesced the
        # CPU-heavy Arrow encode stage to 1-2 tasks at 10x volume and
        # regressed index_build 9s → 12s, while the tiny-shuffle
        # savings it promised were within host noise — bytes-based
        # advisory sizes misprice stages whose cost is per-row Python
        # compute, not I/O. Override per deployment via extra_conf.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(_package_zip())
    return spark
