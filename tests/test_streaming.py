"""Structured Streaming ≡ batch: the same transformation over the same
events must produce identical results through readStream as through a
batch read (the Structured Streaming contract, verified)."""

import pytest

from solr_indexer_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch):
    return (spark.readStream.schema(events_batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_DIR))


def _sorted_rows(df, keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_windowed_counts_stream_equals_batch(spark, events_batch, events_stream):
    batch = windowed_event_counts(events_batch)
    q = run_stream_to_memory(
        windowed_event_counts(events_stream, watermark="2 hours"),
        "win_counts", mode="complete")
    try:
        q.processAllAvailable()
        got = spark.table("win_counts")
        assert _sorted_rows(got, ["win_start", "event_type"]) == \
            _sorted_rows(batch, ["win_start", "event_type"])
    finally:
        q.stop()


def test_session_window_stream_equals_batch(spark, events_batch, events_stream):
    batch = session_window_agg(events_batch)
    q = run_stream_to_memory(
        session_window_agg(events_stream, watermark="2 hours"),
        "sess", mode="complete")
    try:
        q.processAllAvailable()
        got = spark.table("sess")
        keys = ["user_id", "session_start"]
        assert _sorted_rows(got, keys) == _sorted_rows(batch, keys)
    finally:
        q.stop()


def test_query_server_stream(spark, tmp_path):
    """Persistent query server (NEXT r2 #1): a readStream of query rows
    drives foreachBatch top-k against a pinned index; results land
    exactly-once as per-batch partitions; repeated query ids hit the
    θ cache on later batches; answers are rank-identical to direct
    topk_wand."""
    import time
    from pyspark.sql import functions as F
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.wand import topk_wand
    from solr_indexer_spark.streaming.query_server import (
        QUERY_SCHEMA, QueryServer)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bindex = build_block_index(build_index(docs, id_col="doc_id"),
                               shard_range=4096)
    srv = QueryServer(bindex, str(tmp_path / "qsrv"),
                      theta_min_postings=0)
    srv.warm()
    assert bindex.term_dict is not None        # planning = 0 jobs

    src = str(tmp_path / "qin")
    batch1 = [(1, "batch small scan", 10), (2, "dup", 5)]
    batch2 = [(1, "batch small scan", 10), (3, "value table", 10)]
    spark.createDataFrame(batch1, QUERY_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, QUERY_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(QUERY_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = srv.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    t0 = time.time()
    q.processAllAvailable()
    q.stop()
    served_wall = time.time() - t0
    assert srv.batches_served >= 2

    res = srv.results(spark)
    # every query answered; per-batch partitions present
    assert {r["batch_id"] for r in res.select("batch_id").distinct()
            .collect()} >= {0, 1}
    direct = topk_wand(
        spark.createDataFrame(batch2, QUERY_SCHEMA), bindex,
        theta_min_postings=0)
    got = sorted(tuple(r) for r in
                 res.filter("batch_id = 1")
                 .select("query_id", "doc_id", "score", "rank").collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
    # the θ cache persisted entries for the served multi-term queries
    assert srv.theta_cache.load()
    # amortization sanity: serving 2 batches on the warm session is far
    # cheaper than a session spin-up (generous bound — the sandbox CPU
    # token bucket can inflate walls 3×, BENCH.md forensics)
    assert served_wall < 45
