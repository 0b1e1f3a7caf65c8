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


def test_query_server_theta_cache_with_tombstones(spark, tmp_path):
    """r5: the θ cache stays ON for a serving index with deletes —
    carried entries revalidate against the tombstone table inside
    topk_wand (r3 soundness), so repeated queries skip pass A while
    answers stay identical to direct calls under the same tombstones.
    (The r2-era server guard disabled the cache whenever tombstones
    existed — exactly the serving shape that needs it.)"""
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.wand import topk_wand
    from solr_indexer_spark.streaming.query_server import (
        QUERY_SCHEMA, QueryServer)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bindex = build_block_index(build_index(docs, id_col="doc_id"),
                               shard_range=4096)
    tomb = spark.createDataFrame([(7,), (11,)], "doc_id long")
    srv = QueryServer(bindex, str(tmp_path / "qsrv"), tombstones=tomb,
                      theta_min_postings=0)
    srv.warm()
    assert srv.theta_cache is not None
    batch = spark.createDataFrame(
        [(1, "batch small scan", 10)], QUERY_SCHEMA)
    srv.process_batch(batch, 0)
    assert srv.theta_cache.load()          # carry persisted batch 0
    srv.process_batch(batch, 1)
    res = srv.results(spark).filter("batch_id = 1")
    direct = topk_wand(batch, bindex, tombstones=tomb,
                       theta_min_postings=0)
    got = sorted((r["query_id"], r["rank"], r["doc_id"],
                  round(r["score"], 6)) for r in res.collect())
    want = sorted((r["query_id"], r["rank"], r["doc_id"],
                   round(r["score"], 6)) for r in direct.collect())
    assert got == want and got
    assert not ({7, 11} & {d for _, _, d, _ in got})


def test_query_server_lru_mode_and_refresh(spark, tmp_path):
    """r6 (VERDICT r5 #5 wiring): term_planning='lru' serves with the
    bounded cache instead of the full driver pin — a repeated batch is
    0-job-planned (hits grow, misses don't) — and refresh_index on a
    GROWN index invalidates the cache so stale df/max_tfnorm never
    plan a query (results on the grown index match direct topk_wand
    against a fresh handle)."""
    from pyspark.sql import functions as F
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.wand import topk_wand
    from solr_indexer_spark.streaming.query_server import (
        QUERY_SCHEMA, QueryServer)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    bindex = build_block_index(build_index(half, id_col="doc_id"),
                               shard_range=4096)
    srv = QueryServer(bindex, str(tmp_path / "lru_srv"),
                      theta_min_postings=0, use_theta_cache=False,
                      term_planning="lru", term_lru_capacity=64)
    srv.warm()
    assert srv.bindex.term_dict is None        # no full pin in lru mode
    assert srv.bindex.term_lru is not None

    batch = [(1, "dup value", 5), (2, "batch small", 5)]
    qdf = spark.createDataFrame(batch, QUERY_SCHEMA)
    srv.process_batch(qdf, 0)
    lru = srv.bindex.term_lru
    misses_after_first = lru.misses
    srv.process_batch(qdf, 1)                  # warm: no new misses
    assert lru.misses == misses_after_first
    assert lru.hits > 0

    # grow the index (the other half of the corpus), refresh, re-serve
    grown = build_block_index(build_index(docs, id_col="doc_id"),
                              shard_range=4096)
    srv.refresh_index(grown)
    assert srv.bindex is grown and grown.term_lru is lru
    assert len(lru) == 0                       # invalidated
    srv.process_batch(qdf, 2)
    got = sorted(
        tuple(r) for r in
        srv.results(spark).filter("batch_id = 2")
        .select("query_id", "doc_id", "rank").collect())
    fresh = build_block_index(build_index(docs, id_col="doc_id"),
                              shard_range=4096)
    want = sorted(
        (r["query_id"], r["doc_id"], r["rank"]) for r in
        topk_wand(qdf, fresh, theta_min_postings=0).collect())
    assert got == want and got


def test_query_server_rate_soak(spark, tmp_path):
    """VERDICT r3 #9 soak: a rate-source feed drives ≥20 micro-batches
    through the warmed server. Asserts exactly-once per-batch results
    (every (batch, query) has exactly k ranks 1..k and is identical to
    the direct batch answer), and flat per-batch latency (the θ cache
    and pinned dictionaries keep late batches as cheap as early ones —
    no state leak, no monotonic drift)."""
    import statistics
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
    srv = QueryServer(bindex, str(tmp_path / "soak"),
                      theta_min_postings=0)
    srv.warm()

    qtexts = ["scan column window", "sort merge join",
              "batch small dup"]
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", 50).load())
    queries = (rate.select(
        (F.col("value") % 3).cast("int").alias("query_id"),
        F.element_at(F.array(*[F.lit(t) for t in qtexts]),
                     (F.col("value") % 3).cast("int") + 1)
        .alias("query_text"),
        F.lit(5).cast("int").alias("k")))
    # (per-batch duplicate ids are deduped inside process_batch — a
    # streaming-side dropDuplicates would be STATEFUL across batches
    # and starve later batches of repeated query ids)

    q = srv.start(queries, checkpoint_dir=str(tmp_path / "soak_ck"))
    deadline = time.time() + 240
    while srv.batches_served < 20 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert srv.batches_served >= 20, srv.batches_served

    res = srv.results(spark).cache()
    # exactly-once shape: every served (batch, query) has exactly k
    # rows with distinct ranks 1..k
    agg = (res.groupBy("batch_id", "query_id")
           .agg(F.count("*").alias("n"),
                F.countDistinct("rank").alias("nr"),
                F.max("rank").alias("mx")).collect())
    assert agg
    assert all(r["n"] == 5 and r["nr"] == 5 and r["mx"] == 5
               for r in agg)
    # every batch's answer is identical to the direct batch answer
    direct = {}
    qdf = spark.createDataFrame([(i, qtexts[i], 5) for i in range(3)],
                                QUERY_SCHEMA)
    for r in topk_wand(qdf, bindex, theta_min_postings=0).collect():
        direct.setdefault(r["query_id"], set()).add(
            (r["rank"], r["doc_id"], round(r["score"], 6)))
    got = {}
    for r in res.collect():
        got.setdefault((r["batch_id"], r["query_id"]), set()).add(
            (r["rank"], r["doc_id"], round(r["score"], 6)))
    for (bid, qid), rows in got.items():
        assert rows == direct[qid], (bid, qid)
    # θ cache engaged and bounded
    assert srv.theta_cache.load()
    # flat latency: the late-soak median must not drift above the
    # early-soak median beyond token-bucket noise (BENCH.md: ±3×)
    walls = srv.batch_walls
    early = statistics.median(walls[1:6])
    late = statistics.median(walls[-5:])
    assert late <= early * 3, (early, late, walls)


def test_query_server_socket_source(spark, tmp_path):
    """NEXT r6 backlog: the socket source works against a loopback TCP
    feed (the in-sandbox stand-in for an external query feed) — lines
    parse to query rows, malformed lines drop, answers are
    rank-identical to direct topk_wand."""
    import socket
    import threading
    import time
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.wand import topk_wand
    from solr_indexer_spark.streaming.query_server import (
        QUERY_SCHEMA, QueryServer, socket_queries)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bindex = build_block_index(build_index(docs, id_col="doc_id"),
                               shard_range=4096)
    srv = QueryServer(bindex, str(tmp_path / "qsock"),
                      theta_min_postings=0)
    srv.warm()

    lines = ["1\tbatch small scan\t10",
             "2\tdup\t5",
             "not-a-number\tbogus line\tx",   # must drop, not poison
             "3\tvalue table\t10"]
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind(("127.0.0.1", 0))
    port = listener.getsockname()[1]
    listener.listen(1)
    stop = threading.Event()

    def feed():
        conn, _ = listener.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        # the socket source treats disconnect as stream end — hold the
        # connection open until the test has its results
        stop.wait(timeout=60)
        conn.close()

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    stream = socket_queries(spark, "127.0.0.1", port)
    q = srv.start(stream, checkpoint_dir=str(tmp_path / "ckpt_sock"))
    try:
        deadline = time.time() + 60
        want_qids = {1, 2, 3}
        got_qids: set = set()
        while time.time() < deadline and got_qids < want_qids:
            time.sleep(1.0)
            try:
                got_qids = {r["query_id"] for r in srv.results(spark)
                            .select("query_id").distinct().collect()}
            except Exception:
                continue    # no batch written yet
        assert got_qids >= want_qids
    finally:
        stop.set()
        q.stop()
        listener.close()

    res = srv.results(spark).select(
        "query_id", "doc_id", "score", "rank")
    direct = topk_wand(
        spark.createDataFrame([(1, "batch small scan", 10), (2, "dup", 5),
                               (3, "value table", 10)], QUERY_SCHEMA),
        bindex, theta_min_postings=0)
    got = sorted(tuple(r) for r in res.distinct().collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want


def test_query_server_cursor_paging(spark, tmp_path):
    """cursorMark through the server: batch 0 serves page 1 ('*'
    marks), the client reads nextCursorMark off the results, batch 1
    carries the marks and gets the following page — identical to a
    direct start= offset call."""
    from pyspark.sql import functions as F
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.cursor import page_cursors
    from solr_indexer_spark.query.wand import topk_wand
    from solr_indexer_spark.streaming.query_server import QueryServer

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bindex = build_block_index(build_index(docs, id_col="doc_id"),
                               shard_range=4096)
    srv = QueryServer(bindex, str(tmp_path / "qcur"),
                      theta_min_postings=0)
    srv.warm()

    schema = "query_id int, query_text string, k int, cursor_mark string"
    q1 = spark.createDataFrame(
        [(1, "batch small scan", 5, "*"), (2, "dup", 5, None)], schema)
    srv.process_batch(q1, 0)
    page1 = srv.results(spark).filter("batch_id = 0")
    marks = page_cursors(page1)
    assert set(marks) == {1, 2}

    q2 = spark.createDataFrame(
        [(1, "batch small scan", 5, marks[1]),
         (2, "dup", 5, marks[2])], schema)
    srv.process_batch(q2, 1)
    got = sorted(tuple(r) for r in
                 srv.results(spark).filter("batch_id = 1")
                 .select("query_id", "doc_id",
                         F.round("score", 6).alias("s")).collect())
    direct = topk_wand(
        spark.createDataFrame([(1, "batch small scan", 5), (2, "dup", 5)],
                              "query_id int, query_text string, k int"),
        bindex, theta_min_postings=0, start=5)
    want = sorted((r["query_id"], r["doc_id"], round(r["score"], 6))
                  for r in direct.collect())
    assert got == want and got
