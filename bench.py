"""Benchmark harness (driver contract): runs the headline jobs at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ...,
   "docs_per_sec": ..., "query_p95_ms": ...}

Stages:
  index_build   — tokenize -> postings -> compressed block index,
                  materialized to a noop sink (docs/sec headline)
  wand_q*       — per-query block-max top-k latency over the cached
                  block index (p95 headline)
  bm25_exact    — exact-join scorer over the same queries (reference
                  point for the WAND speedup)
  dedup_minhash — MinHash LSH near-dup pass
  ann_topk      — brute-force cosine top-k, 5 query vectors
  window_agg    — tumbling-window event rollup

Protocol (r4, VERDICT r3 #2): the sandbox CPU token bucket penalizes
whatever runs LATE in a long sequence (BENCH.md forensics), so the
r1-r3 append-only stage order left the newest stages reading 3-10×
their steady-state walls in the official record. r4 groups every
THROUGHPUT stage first (index / positional / IVFPQ-store builds and
the dedup_minhash pass — amortized or heavy work, measured on the
freshest bucket; the same dedup job measured 18.5 s early vs 61.6 s
at a drained tail), then idles $BENCH_COOLDOWN (default 150 s,
BENCH.md's own protocol) so the LATENCY probes that follow run
steady-state, reusing every cache (block index, term dict, positional
postings, IVFPQ store) across stages. $BENCH_PRE_COOLDOWN (60 s)
idles before anything runs at all. Like-for-like deltas vs r3 are
documented in BENCH.md per stage, not by bucket position.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from solr_indexer_spark.gate import GATE_QUERIES, _queries_df
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import build_block_index
from solr_indexer_spark.operators.dedup import dedup_minhash_lsh
from solr_indexer_spark.operators.similarity import ann_brute_topk
from solr_indexer_spark.query.scorer import topk
from solr_indexer_spark.query.wand import topk_wand
from solr_indexer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# work amplification for the scaling experiment (same docs, new ids)
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "1"))
# text-length amplification: testdata docs are ~50 tokens; real web
# pages are ~500+ — multiply text so per-task compute is realistic
TEXT_MULT = int(os.environ.get("BENCH_TEXT_MULT", "1"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- steady-state calibration guard (VERDICT r5 #3) -----------------------
# The official driver artifact recorded drained-CPU-bucket walls in 2 of 5
# rounds (BENCH_r05.json read 1.6x the same-HEAD local steady state). The
# guard runs a FIXED CPU loop with a pinned nominal wall before anything is
# measured; while the probe reads > BENCH_CALIB_MAX_RATIO x nominal the
# bucket is drained -> idle BENCH_CALIB_IDLE s and re-probe, bounded
# retries. The probe walls land in the output JSON so the artifact
# discloses the bucket state it was recorded under.

CALIB_NOMINAL_S = float(os.environ.get("BENCH_CALIB_NOMINAL", "2.0"))
CALIB_MAX_RATIO = float(os.environ.get("BENCH_CALIB_MAX_RATIO", "1.5"))
CALIB_IDLE_S = float(os.environ.get("BENCH_CALIB_IDLE", "150"))
CALIB_RETRIES = int(os.environ.get("BENCH_CALIB_RETRIES", "4"))


def _calib_probe() -> float:
    """Fixed CPU workload, ~CALIB_NOMINAL_S steady-state wall on this
    host (160 chained 1024^2 float64 matmuls; BLAS-threaded, so it
    exercises the same parallel-burn throttle the bench stages hit)."""
    import numpy as np
    a = np.random.default_rng(0).random((1024, 1024))
    t0 = time.perf_counter()
    for _ in range(160):
        a = a @ a
        a /= np.abs(a).max()
    return time.perf_counter() - t0


def calibrate() -> dict:
    probes = [_calib_probe()]
    retries = 0
    while (probes[-1] > CALIB_MAX_RATIO * CALIB_NOMINAL_S
           and retries < CALIB_RETRIES):
        time.sleep(CALIB_IDLE_S)
        retries += 1
        probes.append(_calib_probe())
    return {"nominal_s": CALIB_NOMINAL_S,
            "probe_walls_s": [round(p, 3) for p in probes],
            "final_ratio": round(probes[-1] / CALIB_NOMINAL_S, 3),
            "steady": probes[-1] <= CALIB_MAX_RATIO * CALIB_NOMINAL_S}


def main() -> None:
    # partition counts are FIXED (not CPU-derived) so runs at different
    # parallelism levels execute identical plans — cores only change how
    # many tasks run concurrently (the scaling-efficiency contract)
    n_parts = int(os.environ.get("BENCH_PARTITIONS", "64"))
    # calibration BEFORE the session spin-up: nothing is measured until
    # the CPU bucket reads steady (or retries are exhausted — disclosed)
    calibration = calibrate()
    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=n_parts)
    # idle before measuring: whatever ran before this bench (the
    # correctness harness, tests) drained the host's CPU token bucket,
    # and the latency probes below are the headline numbers
    pre_cool = max(0.0, float(os.environ.get("BENCH_PRE_COOLDOWN", "60")))
    if pre_cool > 0:
        time.sleep(pre_cool)
    timings: dict[str, float] = {}
    t_all = time.perf_counter()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if REPLICATE > 1:
        docs = (docs.crossJoin(
            spark.range(REPLICATE).withColumnRenamed("id", "_rep"))
            .withColumn("doc_id",
                        F.col("doc_id") * REPLICATE + F.col("_rep"))
            .drop("_rep"))
    if TEXT_MULT > 1:
        docs = docs.withColumn(
            "text", F.repeat(F.concat(F.col("text"), F.lit(" ")), TEXT_MULT))
    # a single parquet file reads as ~1 partition: without this the
    # whole map side (tokenize/explode/partial agg) runs in one task
    docs = docs.repartition(n_parts).cache()
    n_docs = docs.count()

    # tokenize-probe mode: the map side alone (tokenize+explode+narrow
    # agg, no wide shuffle) — the compute-bound scaling workload; the
    # full build at sandbox sizes is fixed-overhead-bound (BENCH.md)
    if os.environ.get("BENCH_PROBE") == "tokenize":
        from solr_indexer_spark.analysis import tokenize_col
        t0 = time.perf_counter()
        agg = docs.select(F.explode(tokenize_col("text")).alias("t")) \
            .agg(F.count("*").alias("n"),
                 F.sum(F.length("t")).alias("chars")).collect()[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "tokenize_probe", "value": round(dt, 3),
            "unit": "sec", "queries": {"index_build": round(dt, 4)},
            "sf": SF_DIR.rstrip("/").split("sf")[-1], "n_docs": n_docs,
            "n_tokens": int(agg["n"]), "cpus": CPUS,
            "docs_per_sec": round(n_docs / dt, 1),
            "tokens_per_sec": round(int(agg["n"]) / dt, 1),
            "calibration": calibration}))
        spark.stop()
        return

    # --- index build (headline throughput) ---
    t0 = time.perf_counter()
    index = build_index(docs, id_col="doc_id")
    # shard_range fixed (not CPU-derived) so runs at different
    # parallelism levels do identical work — required for the scaling
    # efficiency comparison
    bindex = build_block_index(index, shard_range=2048)
    _noop(bindex.blocks)
    timings["index_build"] = time.perf_counter() - t0
    docs_per_sec = n_docs / timings["index_build"]

    if os.environ.get("BENCH_BUILD_ONLY"):
        print(json.dumps({
            "metric": "index_build_only", "value": round(timings["index_build"], 3),
            "unit": "sec", "queries": {k: round(v, 4) for k, v in timings.items()},
            "sf": SF_DIR.rstrip("/").split("sf")[-1], "n_docs": n_docs,
            "cpus": CPUS, "docs_per_sec": round(docs_per_sec, 1),
            "calibration": calibration}))
        spark.stop()
        return

    # cache the index for the query benches; coalesce the (small after
    # compression) block table so per-query jobs launch few tasks
    bindex.blocks = bindex.blocks.coalesce(max(CPUS // 4, 4)).cache()
    bindex.blocks.count()
    bindex.term_meta = bindex.meta().cache()
    bindex.term_meta.count()
    # long-lived query session: pin the term dictionary driver-side
    # (Lucene's in-RAM term dict) — query planning costs 0 Spark jobs
    bindex.load_term_dict()

    # codec efficiency: varbyte block bytes vs raw fixed-width postings
    # (doc_id 8B + tf 4B + dl 4B = 16B per posting)
    comp = bindex.blocks.agg(
        F.sum("n").alias("n_postings"),
        (F.sum(F.length("docs")) + F.sum(F.length("tfs")) +
         F.sum(F.length("dls"))).alias("compressed_bytes")).collect()[0]
    compression_ratio = round(
        int(comp["n_postings"]) * 16 / int(comp["compressed_bytes"]), 2)
    index.postings = index.postings.cache()
    index.postings.count()
    index.term_stats = index.term_stats.cache()
    index.term_stats.count()
    index.corpus_stats = index.corpus_stats.cache()
    index.corpus_stats.count()

    # remaining heavy BUILDS, still on the freshest bucket (throughput
    # stages); every probe below reuses these caches/stores
    from solr_indexer_spark.index.positions import positional_postings
    from solr_indexer_spark.query.qtree import search_tree
    t0 = time.perf_counter()
    pos = positional_postings(docs, id_col="doc_id").cache()
    pos.count()
    timings["positional_build"] = time.perf_counter() - t0

    import tempfile
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    qs = embs.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_vec_id")
    from solr_indexer_spark.operators.similarity import (
        ann_ivf_pq_topk, ivf_pq_store, kmeans_centroids, pq_train,
        training_sample)
    t0 = time.perf_counter()
    X = training_sample(embs)          # ONE sample job for both trainers
    C = kmeans_centroids(embs, nlist=16, sample=X)
    books = pq_train(embs, C, m=8, sample=X)
    pq_path = tempfile.mkdtemp(prefix="bench_ivfpq_") + "/store"
    ivf_pq_store(embs, C, books, pq_path)
    timings["ivfpq_store_build"] = time.perf_counter() - t0

    # the one CPU-heavy curation stage also runs in the throughput
    # block: the token bucket clamps sustained parallel burns hardest
    # at the END of a session (measured 18.5 s here vs 61.6 s at the
    # drained tail, same code same input), so it runs while the bucket
    # is freshest, right after the builds
    t0 = time.perf_counter()
    _noop(dedup_minhash_lsh(docs, n_hashes=16, bands=4, threshold=0.5))
    timings["dedup_minhash"] = time.perf_counter() - t0

    # builds drained the bucket they were measured on; idle so the
    # LATENCY probes below run steady-state (BENCH.md protocol)
    cooldown = max(0.0, float(os.environ.get("BENCH_COOLDOWN", "150")))
    if cooldown > 0:
        time.sleep(cooldown)

    # --- query latencies (steady-state: one unrecorded warmup spins up
    # the Arrow python workers) ---
    qdf = _queries_df(spark)
    topk_wand(qdf.limit(1), bindex).collect()
    # best-of-2 per query: steady-state latency, resistant to the
    # host's CPU-token-bucket transients (3x run variance documented in
    # BENCH.md — single-shot numbers conflate throttle state with cost)
    q_times = []
    for qid, qtext, k in GATE_QUERIES:
        one = qdf.filter(F.col("query_id") == qid)
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            topk_wand(one, bindex).collect()
            best = min(best, time.perf_counter() - t0)
        timings[f"wand_q{qid}"] = best
        q_times.append(best)
    q_times.sort()
    p95 = q_times[max(int(len(q_times) * 0.95) - 1, 0)]

    # all 7 queries through ONE planning+decode pass — the batched
    # throughput story (per-query Spark-job overhead amortized)
    t0 = time.perf_counter()
    topk_wand(qdf, bindex).collect()
    timings["wand_all7_batched"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    topk(qdf, index).collect()
    timings["bm25_exact_all"] = time.perf_counter() - t0

    # deep-paging A/B (r6): the SAME deep page served via start=offset
    # (rank heap + transfer of depth+k rows) vs via cursorMark (heap
    # depth k at any page depth — query/cursor.py). 'dup' is
    # single-term, so both runs decode identical blocks: the delta
    # isolates the rank-depth cost, which grows with depth×partitions
    # at scale while the cursor side stays flat
    from solr_indexer_spark.query.cursor import (decode_cursors,
                                                 page_cursors)
    # deepest honest page: the corpus's most frequent term (term asc
    # tiebreak — deterministic), page at 80% of its match count
    top = (index.term_stats.orderBy(F.col("df").desc(),
                                    F.col("term").asc())
           .select("term", "df").first())
    depth = int(int(top["df"]) * 0.8)
    deep_q = spark.createDataFrame(
        [(99, top["term"], 10)], "query_id int, query_text string, k int")
    # unmeasured setup: the client's mark = rank tuple at `depth`
    mark_row = topk_wand(deep_q.withColumn("k", F.lit(1)), bindex,
                         start=depth - 1)
    after = decode_cursors(page_cursors(mark_row))
    if after:
        best_off = best_cur = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            off_rows = topk_wand(deep_q, bindex, start=depth).collect()
            best_off = min(best_off, time.perf_counter() - t0)
            t0 = time.perf_counter()
            cur_rows = topk_wand(deep_q, bindex, after=after).collect()
            best_cur = min(best_cur, time.perf_counter() - t0)
        assert [r["doc_id"] for r in off_rows] == \
            [r["doc_id"] for r in cur_rows], "cursor page != offset page"
        timings["deep_page_offset"] = best_off
        timings["deep_page_cursor"] = best_cur

    # sloppy-phrase probe over the positional index (Lucene "a b"~N)
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        search_tree('"batch small"~2 AND dup^2', docs, index, k=10,
                    pos_postings=pos).collect()
        best = min(best, time.perf_counter() - t0)
    timings["phrase_slop_query"] = best

    # IVFPQ pruned ADC probe over the store built above
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        ann_ivf_pq_topk(spark, pq_path, C, books, qs, k=10, nprobe=4,
                        refine=4, vectors=embs).collect()
        best = min(best, time.perf_counter() - t0)
    timings["ann_ivfpq_topk"] = best

    t0 = time.perf_counter()
    ann_brute_topk(embs, qs, k=10).collect()
    timings["ann_topk"] = time.perf_counter() - t0

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t0 = time.perf_counter()
    _noop(events.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"),
                         "event_type")
          .agg(F.count("*").alias("n"), F.sum("value").alias("s")))
    timings["window_agg"] = time.perf_counter() - t0

    # total = measured work only (the idle cooldown is protocol, not cost)
    total = time.perf_counter() - t_all - cooldown
    print(json.dumps({
        "metric": "index_build_and_query_bench",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "cpus": CPUS,
        "docs_per_sec": round(docs_per_sec, 1),
        "query_p95_ms": round(p95 * 1000, 1),
        "n_postings": int(comp["n_postings"]),
        "compression_ratio": compression_ratio,
        "calibration": calibration,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
