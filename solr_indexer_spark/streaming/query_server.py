"""Persistent query server — the long-lived serving shape (NEXT r2 #1).

The reference serves queries through a standing Solr process
(solrindexer/search.py:211-237: every CLI call hits the same warm
server). The Spark analogue is a long-lived session + Structured
Streaming of QUERIES: query rows arrive on a stream (files here; a
socket/Kafka source in production), each micro-batch runs the
driver-planned block-max top-k against a PINNED index, results append
to a per-batch-partitioned sink.

What the long-lived shape amortizes (paid once, not per query):
  * SparkSession + executor JVM spin-up (~15 s in this sandbox);
  * the cached/coalesced block table and term_meta;
  * the driver-pinned term dictionary (0-job query planning);
  * Arrow python workers for the decode pass;
  * the ThetaCache — repeated query ids skip pass A entirely on later
    batches (multi-segment θ carry-over, query/wand.py).

Exactly-once: results land as per-batch partitions
(``results/batch_id=N``) with mode=overwrite — a foreachBatch replay
rewrites its own directory (the StreamingIndexIngest pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.codec import BlockIndex
from ..query.wand import ThetaCache, topk_wand

QUERY_SCHEMA = "query_id int, query_text string, k int"


class QueryServer:
    def __init__(self, bindex: BlockIndex, out_dir: str,
                 tombstones: DataFrame | None = None,
                 use_theta_cache: bool = True,
                 theta_min_postings: int | None = None,
                 term_planning: str = "pin",
                 term_lru_capacity: int = 100_000):
        if term_planning not in ("pin", "lru"):
            raise ValueError("term_planning must be 'pin' or 'lru'")
        # 'pin' collects the whole term dictionary driver-side (0-job
        # planning, right up to ~10⁶-term vocabularies); 'lru' is the
        # web-vocabulary mode (VERDICT r5 #5) — bounded driver memory,
        # 0 jobs on the Zipfian hot head, one pruned read per cold miss
        self.term_planning = term_planning
        self.term_lru_capacity = term_lru_capacity
        self.bindex = bindex
        self.out_dir = out_dir
        self.tombstones = tombstones
        os.makedirs(out_dir, exist_ok=True)
        # θ carry is sound UNDER tombstones since r3: carried entries
        # hold (doc_id, tf, dl) triples and topk_wand revalidates them
        # against the tombstone table with one tiny anti-join (killed
        # docs drop out; < k survivors falls back to pass A) — so the
        # cache stays on for a serving index with deletes, exactly
        # where the pass-A skip matters most (r5; the r2-era guard
        # disabled it whenever tombstones existed)
        self.theta_cache = (ThetaCache(os.path.join(out_dir, "_theta.json"))
                            if use_theta_cache else None)
        self.theta_min_postings = theta_min_postings
        self.batches_served = 0
        self.batch_walls: list[float] = []   # per-batch serve seconds

    def warm(self) -> None:
        """Pay the one-time costs up front: cache+coalesce the block
        table, cache term_meta, and set up term planning (full driver
        pin, or the bounded LRU in 'lru' mode)."""
        spark = self.bindex.blocks.sparkSession
        cpus = spark.sparkContext.defaultParallelism
        self.bindex.blocks = self.bindex.blocks.coalesce(
            max(cpus // 4, 4)).cache()
        self.bindex.blocks.count()
        self.bindex.term_meta = self.bindex.meta().cache()
        self.bindex.term_meta.count()
        if self.term_planning == "pin":
            self.bindex.load_term_dict()
        else:
            self.bindex.use_term_lru(self.term_lru_capacity)

    def refresh_index(self, bindex: BlockIndex) -> None:
        """Swap in a GROWN index (streamed appends): re-warm the block
        and meta caches and refresh term planning — the pinned dict is
        re-collected; in 'lru' mode the cache object carries over (its
        capacity and hit counters survive) but is ``invalidate()``d,
        because both df/max_tfnorm values and negative entries go
        stale when postings change."""
        if self.term_planning == "lru" and self.bindex.term_lru is not None:
            lru = self.bindex.term_lru
            lru.invalidate()
            bindex.term_lru = lru
        self.bindex = bindex
        self.warm()

    def process_batch(self, queries: DataFrame, batch_id: int) -> None:
        """foreachBatch body — also directly callable for tests."""
        import time
        t0 = time.perf_counter()
        # a request batch is one row per query id (Solr request
        # semantics); duplicate ids in one batch would double-count
        # their term weights. Deterministic pick (min (text, k) struct)
        # — dropDuplicates keeps an ARBITRARY row, which would let a
        # foreachBatch replay overwrite batch_id=N with a different
        # answer than the first attempt
        has_cursor = "cursor_mark" in queries.columns
        qcols = ["query_text", "k"] + (["cursor_mark"] if has_cursor
                                       else [])
        queries = (queries.groupBy("query_id")
                   .agg(F.min(F.struct(*qcols)).alias("_q"))
                   .select("query_id", *[f"_q.{c}" for c in qcols]))
        after = None
        if has_cursor:
            # cursorMark deep paging through the server (query/
            # cursor.py): marks ride the request rows; '*'/NULL =
            # first page. The collect is planning-sized (one row per
            # query, same class as topk_wand's own spec collect); the
            # client reads its nextCursorMark off the result partition
            # with page_cursors
            from ..query.cursor import decode_cursors
            after = decode_cursors(
                {r["query_id"]: r["cursor_mark"]
                 for r in queries.select("query_id", "cursor_mark")
                 .filter(F.col("cursor_mark").isNotNull()).collect()})
            queries = queries.drop("cursor_mark")
        kwargs = {}
        if after:
            kwargs["after"] = after
        if self.theta_min_postings is not None:
            kwargs["theta_min_postings"] = self.theta_min_postings
        carry_out: dict = {}
        carry_in = self.theta_cache.load() if self.theta_cache else None
        hits = topk_wand(queries, self.bindex,
                         tombstones=self.tombstones,
                         theta_carry=carry_in, carry_out=carry_out,
                         **kwargs)
        (hits.write.mode("overwrite")
         .parquet(os.path.join(self.out_dir, "results",
                               f"batch_id={batch_id}")))
        if self.theta_cache and carry_out:
            self.theta_cache.save(carry_out)
        self.batches_served += 1
        self.batch_walls.append(time.perf_counter() - t0)

    def start(self, queries_stream: DataFrame, checkpoint_dir: str):
        """Attach to a readStream of (query_id, query_text, k) rows."""
        return (queries_stream.writeStream
                .option("checkpointLocation", checkpoint_dir)
                .foreachBatch(lambda df, bid: self.process_batch(df, bid))
                .start())

    def results(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.out_dir, "results"))


def socket_queries(spark, host: str = "127.0.0.1",
                   port: int = 9999) -> DataFrame:
    """Query stream from a TCP text feed — one query per line,
    ``query_id<TAB>query_text<TAB>k`` — ready to pass to
    :meth:`QueryServer.start`.

    Spark's socket source is its live-feed dev/test source: NOT
    replayable (offsets can't be re-read after a driver crash), so a
    production deployment swaps in a replayable bus (Kafka) with this
    same line parser; within a run, the server's per-batch overwrite
    sink still makes foreachBatch retries idempotent. Malformed lines
    (unparseable id) are dropped rather than poisoning the batch —
    the same fail-soft rule as the ingest validators."""
    raw = (spark.readStream.format("socket")
           .option("host", host).option("port", port).load())
    parts = F.split(F.col("value"), "\t")
    # try_cast, not cast: under ANSI mode (Spark 4 default) a malformed
    # id would THROW inside the micro-batch and kill the stream — the
    # fail-soft contract needs NULL-and-drop. The optional 4th field is
    # a cursorMark ('*' or a mark from a previous page's results)
    return (raw.select(
        parts.getItem(0).try_cast("int").alias("query_id"),
        parts.getItem(1).alias("query_text"),
        parts.getItem(2).try_cast("int").alias("k"),
        F.when(F.size(parts) >= 4, parts.getItem(3))
        .alias("cursor_mark"))
        .filter(F.col("query_id").isNotNull()
                & F.col("query_text").isNotNull()))
