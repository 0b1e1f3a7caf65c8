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
        # Coalesce strictly by size (guide §2.2): with parallelismFirst
        # (the default) AQE refuses to merge below the default
        # parallelism, so a kilobyte-sized shuffle still schedules
        # shuffle_partitions tasks — pure per-task overhead on every
        # exchange. Respecting the advisory size is Spark's own
        # recommendation; at production scale partitions exceed the
        # advisory size and nothing over-coalesces. Both knobs are
        # env-overridable for cluster deployments.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PART", "64m"))
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
