"""Round-7 auxiliary benchmarks (guide §1.4 noop-sink isolation and
the interleaved A/B legs cited in OPTIMIZATION_r07.md / BENCH.md).

NOT part of the driver contract — ``bench.py`` is the frozen
measurement surface. This file packages the probes the r07 round used
so they are re-runnable:

  floor     — per-action floor costs: cached count, narrow noop, one
              tiny exchange, a 1-row collect of a local relation
  dedup     — ONE cold dedup_minhash_lsh leg (fresh session; run
              alternately against two trees for an interleaved A/B:
              ``PYTHONPATH=<tree> python bench_extra.py dedup``)
  wand      — best-of-4 single-query / batched WAND + exact-scorer
              latencies over a warm session (the same shape bench.py
              times cold)
  builds    — noop-isolated index/positional/ivfpq sub-stage timings

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_REPLICATE (default 1 — set 10
for the driver-scale legs). Output: one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "1"))


def _spark():
    from solr_indexer_spark.session import get_spark
    return get_spark("bench_extra", master=f"local[{CPUS}]",
                     shuffle_partitions=64)


def _docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if REPLICATE > 1:
        docs = (docs.crossJoin(
            spark.range(REPLICATE).withColumnRenamed("id", "_rep"))
            .withColumn("doc_id",
                        F.col("doc_id") * REPLICATE + F.col("_rep"))
            .drop("_rep"))
    docs = docs.repartition(64).cache()
    docs.count()
    # spin the Arrow python workers so cold probes time the engine,
    # not worker forks
    docs.limit(10).mapInPandas(lambda it: it, schema=docs.schema) \
        .write.format("noop").mode("overwrite").save()
    return docs


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _best(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def probe_floor() -> dict:
    spark = _spark()
    docs = _docs(spark)
    out = {
        "count_cached_s": _best(lambda: docs.count(), 3),
        "narrow_noop_s": _best(lambda: _noop(docs.select("doc_id")), 3),
        "one_exchange_s": _best(
            lambda: _noop(docs.groupBy("doc_id")
                          .agg(F.count("*").alias("n"))), 3),
    }
    local = spark.createDataFrame(
        [(i, f"q{i}", 10) for i in range(7)],
        "query_id int, query_text string, k int")
    one = local.filter(F.col("query_id") == 1)
    out["local_1row_collect_s"] = _best(lambda: one.collect(), 4)
    spark.stop()
    return {"metric": "floor", **{k: round(v, 4) for k, v in out.items()}}


def probe_dedup() -> dict:
    from solr_indexer_spark.operators.dedup import dedup_minhash_lsh
    spark = _spark()
    docs = _docs(spark)
    t0 = time.perf_counter()
    _noop(dedup_minhash_lsh(docs, n_hashes=16, bands=4, threshold=0.5))
    cold = time.perf_counter() - t0
    warm = _best(
        lambda: _noop(dedup_minhash_lsh(docs, n_hashes=16, bands=4,
                                        threshold=0.5)), 2)
    spark.stop()
    return {"metric": "dedup_minhash", "replicate": REPLICATE,
            "cold_s": round(cold, 3), "warm_best_s": round(warm, 3)}


def probe_wand() -> dict:
    from solr_indexer_spark.gate import _queries_df
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.query.scorer import topk
    from solr_indexer_spark.query.wand import topk_wand
    spark = _spark()
    docs = _docs(spark)
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=2048)
    bindex.blocks = bindex.blocks.coalesce(max(CPUS // 4, 4)).cache()
    bindex.blocks.count()
    bindex.load_term_dict()
    for t in ("postings", "term_stats", "corpus_stats"):
        setattr(index, t, getattr(index, t).cache())
        getattr(index, t).count()
    qdf = _queries_df(spark)
    topk_wand(qdf.limit(1), bindex).collect()
    one = qdf.filter(F.col("query_id") == 1)
    out = {
        "wand_q1_s": _best(lambda: topk_wand(one, bindex).collect(), 4),
        "wand_all7_s": _best(lambda: topk_wand(qdf, bindex).collect(), 4),
        "bm25_all7_s": _best(lambda: topk(qdf, index).collect(), 4),
    }
    spark.stop()
    return {"metric": "wand_warm",
            **{k: round(v, 4) for k, v in out.items()}}


def probe_builds() -> dict:
    import tempfile
    from solr_indexer_spark.index.build import build_index
    from solr_indexer_spark.index.codec import build_block_index
    from solr_indexer_spark.index.positions import positional_postings
    from solr_indexer_spark.operators.similarity import (
        ivf_pq_store, kmeans_centroids, pq_train, training_sample)
    spark = _spark()
    docs = _docs(spark)
    out = {}
    t0 = time.perf_counter()
    index = build_index(docs, id_col="doc_id")
    index.n_and_avgdl()
    out["corpus_stats_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _noop(build_block_index(index, shard_range=2048).blocks)
    out["blocks_noop_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    pos = positional_postings(docs, id_col="doc_id").cache()
    pos.count()
    out["positional_s"] = time.perf_counter() - t0
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    t0 = time.perf_counter()
    X = training_sample(embs)
    out["training_sample_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    C = kmeans_centroids(embs, nlist=16, sample=X)
    books = pq_train(embs, C, m=8, sample=X)
    out["kmeans_pq_numpy_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivf_pq_store(embs, C, books,
                 tempfile.mkdtemp(prefix="bx_ivfpq_") + "/store")
    out["ivfpq_write_s"] = time.perf_counter() - t0
    spark.stop()
    return {"metric": "builds",
            **{k: round(v, 4) for k, v in out.items()}}


PROBES = {"floor": probe_floor, "dedup": probe_dedup,
          "wand": probe_wand, "builds": probe_builds}


def main() -> None:
    which = sys.argv[1:] or ["floor"]
    for name in which:
        print(json.dumps(PROBES[name]()))


if __name__ == "__main__":
    main()
