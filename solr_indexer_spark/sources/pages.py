"""Corpus sources: the reference discovers its corpus as a single file,
a newline-delimited list file, or a (recursive) directory
(solrindexer/cli.py:516-540 _resolve_input_files; tools.py:196-205
find_xml_files). The Spark restatement: the corpus is a table; the
three modes become table reads / manifest joins / partition listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Directory/table scan (S3). Partition discovery, predicate
    pushdown and column pruning are Spark's job. ``path`` may contain
    globs; recursive lookup mirrors the reference's ``-r`` flag."""
    return (spark.read.option("recursiveFileLookup", "true").parquet(path))


def read_single(spark: SparkSession, path: str, url: str) -> DataFrame:
    """Single-document mode (S1, ``-i FILE``): a 1-row slice by key."""
    return read_pages(spark, path).filter(F.col("url") == url)


def read_manifest(spark: SparkSession, table_path: str,
                  manifest_path: str) -> DataFrame:
    """List-file mode (S2, ``-l LIST``): newline-delimited url manifest
    joined (broadcast semi-join) against the corpus — the manifest is
    tiny, the corpus scan stays pruned/pushed-down."""
    wanted = (spark.read.text(manifest_path)
              .select(F.trim("value").alias("url"))
              .filter(F.col("url") != ""))
    return read_pages(spark, table_path).join(
        F.broadcast(wanted), "url", "left_semi")


def realtime_get(docs: DataFrame, id_col: str, key) -> DataFrame:
    """Point lookup (S10, /get?id= — solrindexer/tools.py:68-85)."""
    return docs.filter(F.col(id_col) == key)
