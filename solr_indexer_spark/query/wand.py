"""Block-max top-k over the compressed posting blocks — the fast query
path (the engine-side replacement for Lucene's block-max WAND).

Distributed shape (and why it is exact):

1. **Prune to query terms.** The blocks table is joined to the
   broadcast query-term table — only blocks of query terms are ever
   read (with the term-bucketed physical layout this is partition-level
   pruning, the scan never touches other terms' files).

2. **Pass A — threshold seeding.** For each query, the champion term
   (max qtf·idf·shard-max-tfnorm — the rarest/highest-impact term) is
   decoded and scored exactly; the k-th best single-term partial score
   is a valid *lower bound* θ₀ of the final k-th score (BM25 sums
   non-negative contributions, so any doc's final score ≥ its champion
   partial).

3. **Pass B — block-max pruning.** A block b of term t can only
   contain a top-k doc if
       ub(b) = qtf_t·idf_t·max_tfnorm(b) + Σ_{t'≠t} qtf·idf·max_tfnorm(t')
   reaches θ₀. For any doc d in block b, ub(b) ≥ score(d); hence every
   block holding a true top-k doc survives, every surviving doc is
   scored over ALL its surviving term blocks, i.e. exactly; pruned docs
   are only ever under-scored and can never displace a true top-k doc
   (ties break on doc_id identically in either order). Exactness holds
   per-query regardless of sharding.

4. **Bounded-heap top-k.** Surviving blocks are decoded in a
   vectorized Arrow pass, partial scores summed per (query, doc), and
   ranked under the same contract as the exact scorer
   (round(score, 6) DESC, doc_id ASC). Spark's rank-limit pushdown
   (WindowGroupLimitExec) maintains the per-partition bounded heap
   before the final merge, so no partition materializes more than k
   rows per query.

The blocks' (first_doc, last_doc) skip pointers bound each decode to
one 128-doc block; decoding is numpy varbyte (index/codec.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import SCORE_DECIMALS, idf_col, tokenize_col
from ..index.codec import BlockIndex, decode_posting_block

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("query_id", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("s", T.DoubleType(), False),
])


def _score_blocks_map(it):
    """Arrow pass: rows (query_id, w=qtf·idf, docs, tfs, dls, avgdl-frozen
    max_tfnorm precomputed at encode time is not needed here — scores are
    recomputed exactly from tf/dl) → (query_id, doc_id, s)."""
    from .. import B, K1
    for pdf in it:
        qids, docs_out, s_out = [], [], []
        avgdls = pdf["avgdl"].to_numpy()
        ws = pdf["w"].to_numpy()
        for i, row in enumerate(pdf.itertuples(index=False)):
            d, tf, dl = decode_posting_block(row.docs, row.tfs, row.dls)
            tfnorm = tf / (tf + K1 * (1.0 - B + B * dl / avgdls[i]))
            qids.append(np.full(d.size, row.query_id, dtype=np.int32))
            docs_out.append(d)
            s_out.append(ws[i] * tfnorm)
        if qids:
            yield pd.DataFrame({
                "query_id": np.concatenate(qids),
                "doc_id": np.concatenate(docs_out),
                "s": np.concatenate(s_out),
            })


def _query_terms(queries: DataFrame, bindex: BlockIndex) -> DataFrame:
    qt = (queries
          .select("query_id", "k",
                  F.explode(tokenize_col("query_text")).alias("term"))
          .groupBy("query_id", "k", "term").agg(F.count("*").alias("qtf")))
    return (qt.join(bindex.term_stats.select("term", "df"), "term")
            .withColumn("idf", idf_col(F.col("df"), F.lit(bindex.n_docs)))
            .withColumn("w", F.col("qtf") * F.col("idf")))


def topk_wand(queries: DataFrame, bindex: BlockIndex,
              default_k: int = 10) -> DataFrame:
    """(query_id, doc_id, score, rank) — rank-identical to the exact
    scorer (and the oracle), but reading only surviving blocks."""
    spark = queries.sparkSession
    qterms = _query_terms(queries, bindex).cache()

    # blocks of query terms only (scan pruning), weighted
    qblocks = (bindex.blocks
               .join(F.broadcast(qterms.select("query_id", "k", "term", "w")), "term")
               .withColumn("avgdl", F.lit(bindex.avgdl)))

    # per (query, term) global max block bound
    tmax = (qblocks.groupBy("query_id", "term", "w")
            .agg(F.max("max_tfnorm").alias("mt"))
            .withColumn("t_ub", F.col("w") * F.col("mt")))
    total_ub = tmax.groupBy("query_id").agg(F.sum("t_ub").alias("sum_ub"))

    # pass A: champion term per query → exact single-term partials → θ₀
    wch = Window.partitionBy("query_id").orderBy(
        F.col("t_ub").desc(), F.col("term").asc())
    champion = (tmax.withColumn("_r", F.row_number().over(wch))
                .filter(F.col("_r") == 1).select("query_id", "term"))
    champ_blocks = qblocks.join(F.broadcast(champion), ["query_id", "term"])
    champ_partials = champ_blocks.select(
        "query_id", "w", "docs", "tfs", "dls", "avgdl"
    ).mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
    wk = Window.partitionBy("query_id").orderBy(F.col("s").desc())
    theta = (champ_partials.withColumn("_r", F.row_number().over(wk))
             .join(F.broadcast(queries.select("query_id", "k")), "query_id")
             .filter(F.col("_r") == F.coalesce(F.col("k"), F.lit(default_k)))
             .select("query_id", F.col("s").alias("theta0")))

    # pass B: block-level union bound vs θ₀
    pruned = (qblocks
              .join(F.broadcast(tmax.select("query_id", "term", "t_ub")),
                    ["query_id", "term"])
              .join(F.broadcast(total_ub), "query_id")
              .join(F.broadcast(theta), "query_id", "left")
              .withColumn("block_ub",
                          F.col("sum_ub") - F.col("t_ub") + F.col("w") * F.col("max_tfnorm"))
              .filter(F.col("theta0").isNull() |
                      (F.col("block_ub") >= F.col("theta0"))))

    partials = pruned.select(
        "query_id", "w", "docs", "tfs", "dls", "avgdl"
    ).mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
    scored = partials.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))

    wr = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(), F.col("doc_id").asc())
    out = (scored.withColumn("rank", F.row_number().over(wr))
           .join(F.broadcast(queries.select("query_id", "k")), "query_id")
           .filter(F.col("rank") <= F.coalesce(F.col("k"), F.lit(default_k)))
           .drop("k")
           .orderBy("query_id", "rank"))
    return out
