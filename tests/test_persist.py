"""persist_index: term-bucketed physical layout round-trip + the
bucket-pruning property (a query's terms map to a subset of buckets)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.index.build import build_index, persist_index


def test_persist_and_bucket_pruning(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = build_index(docs, id_col="doc_id")
    base = str(tmp_path / "idx")
    persist_index(index, base, term_buckets=8)

    back = spark.read.parquet(f"{base}/postings")
    assert back.count() == index.postings.count()
    # layout invariant: every term lives in exactly the bucket
    # pmod(hash(term), 8) — the pruning contract
    bad = back.filter(
        F.col("bucket") != F.pmod(F.hash("term"), F.lit(8))).count()
    assert bad == 0
    # a term filter touches only its bucket's files (partition pruning)
    one = back.filter(F.col("term") == "batch")
    buckets = {r["bucket"] for r in one.select("bucket").distinct().collect()}
    assert len(buckets) == 1
    stats = spark.read.parquet(f"{base}/term_stats")
    assert stats.count() == index.term_stats.count()
