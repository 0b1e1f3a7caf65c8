"""Streaming index ingest: two micro-batches must produce an index that
answers queries identically to a single batch build over the union
corpus (current-stats scoring; drift-safe block bounds)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index
from solr_indexer_spark.query.wand import topk_wand
from solr_indexer_spark.streaming.ingest import StreamingIndexIngest

QUERIES = [(1, "term0000 term0101 term0202", 10),
           (2, "uniq00000047", 5),
           (3, "term0003 term0404", 10)]


@pytest.fixture(scope="module")
def pages(spark):
    return latest_wins(extract_pages(synth_pages(spark, n_docs=500))).cache()


def _hits_by_url(spark, bindex, doc_map, theta_min):
    q = spark.createDataFrame(QUERIES, "query_id int, query_text string, k int")
    hits = topk_wand(q, bindex, theta_min_postings=theta_min)
    joined = hits.join(doc_map, "doc_id")
    return sorted((r["query_id"], r["url"], round(r["score"], 6))
                  for r in joined.collect())


@pytest.mark.parametrize("theta_min", [0, 10**9])
def test_two_batch_stream_equals_batch_build(spark, pages, tmp_path, theta_min):
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)

    ing = StreamingIndexIngest(str(tmp_path / "sidx"), shard_range=128,
                               group_size=8)
    r0 = ing.process_batch(half1, 0)
    r1 = ing.process_batch(half2, 1)
    assert r0["docs"] + r1["docs"] == pages.count() - 2  # 2 fatal fixtures
    bindex = ing.load(spark)
    doc_map = spark.read.parquet(str(tmp_path / "sidx" / "doc_map"))
    streamed = _hits_by_url(spark, bindex, doc_map, theta_min)

    good, _ = validate(pages)
    ref_docs = assign_doc_ids(good, id_col="url")
    ref_bindex = build_block_index(build_index(ref_docs, id_col="doc_id"),
                                   shard_range=128)
    ref_map = ref_docs.select("doc_id", "url")
    expected = _hits_by_url(spark, ref_bindex, ref_map, theta_min)

    assert streamed == expected

    # current stats reflect the union corpus exactly
    n_ref, avgdl_ref = ref_bindex.n_docs, ref_bindex.avgdl
    assert bindex.n_docs == n_ref
    assert bindex.avgdl == pytest.approx(avgdl_ref, rel=1e-12)
