"""MoreLikeThis — Solr's MLT handler (``mlt=true&mlt.fl=text``):
given seed document(s), extract each seed's most "interesting" terms
(top tf·idf within the seed) and rank OTHER documents by BM25 against
that term set, excluding the seed itself.

Reference surface: the Solr core behind the reference exposes
/mlt and the MoreLikeThisComponent on every search handler; the
engine-side contract is Lucene's MoreLikeThis (interesting-term
extraction -> boolean OR query).

Scale shape: the seed fetch is an id-pruned scan (same as realtime
get); interesting-term extraction tokenizes ONLY the seeds and joins
their ≤ |seed vocab| distinct terms against term_stats (seed side
broadcast — term_stats never shuffles); the chosen terms are a
planning-sized driver list (seeds × mlt.maxqt, same class as query
specs), and the ranking reuses the stock top-k machinery, so all of
its pruning/paging applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import SCORE_DECIMALS, idf_col, tokenize_col
from ..index.build import InvertedIndex
from .scorer import topk

#: tf·idf is rounded to the rank-order grid before choosing the top
#: terms — two engines computing ln() can differ in the last ulp, and
#: the term tiebreak must decide such ties identically everywhere
#: (same contract as score ranking, analysis.py SCORE_DECIMALS)
_TFIDF_DECIMALS = SCORE_DECIMALS


def interesting_terms(seed_ids: list, index: InvertedIndex,
                      docs: DataFrame, text_col: str = "text",
                      max_terms: int = 5) -> DataFrame:
    """(seed_id, term, tfidf_r, pos) — each seed's top ``max_terms``
    terms by tf·idf within the seed doc (Lucene MLT's interesting
    terms; mlt.maxqt). idf is the engine's BM25 idf so "interesting"
    means exactly what ranking rewards. Ties: term ascending."""
    id_col = index.id_col
    n_docs, _ = index.n_and_avgdl()
    seeds = (docs.filter(F.col(id_col).isin(list(seed_ids)))
             .select(F.col(id_col).alias("seed_id"),
                     F.explode(tokenize_col(text_col)).alias("term"))
             .groupBy("seed_id", "term").agg(F.count("*").alias("tf")))
    scored = (index.term_stats.select("term", "df")
              .join(F.broadcast(seeds), "term")
              .withColumn("tfidf_r",
                          F.round(F.col("tf") * idf_col(F.col("df"),
                                                        F.lit(n_docs)),
                                  _TFIDF_DECIMALS)))
    w = Window.partitionBy("seed_id").orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc())
    return (scored.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= max_terms)
            .select("seed_id", "term", "tfidf_r", "pos"))


def more_like_this(seed_ids: list, index: InvertedIndex,
                   docs: DataFrame, text_col: str = "text",
                   max_terms: int = 5, k: int = 10,
                   tombstones: DataFrame | None = None) -> DataFrame:
    """(seed_id, <id>, score, rank) — for each seed, the top-k OTHER
    docs by BM25 over the seed's interesting terms (each term weight 1,
    Solr mlt.boost=false default; the terms are distinct by
    construction so qtf is 1 everywhere)."""
    id_col = index.id_col
    terms = interesting_terms(seed_ids, index, docs, text_col,
                              max_terms).collect()
    by_seed: dict = {}
    for r in terms:
        by_seed.setdefault(r["seed_id"], []).append(r["term"])
    if not by_seed:
        # empty, with the id column's real type preserved
        return (docs.select(F.col(id_col)).limit(0)
                .withColumn("seed_id", F.col(id_col))
                .select("seed_id", id_col,
                        F.lit(0.0).alias("score"),
                        F.lit(0).alias("rank")))
    spark = docs.sparkSession
    # dense synthetic query ids (seed ids can be any type/width);
    # tokens contain no whitespace, so a space-joined query_text
    # re-tokenizes to exactly the chosen terms
    seeds_sorted = sorted(by_seed)
    qdf = spark.createDataFrame(
        [(i, " ".join(by_seed[s]), int(k + 1))
         for i, s in enumerate(seeds_sorted)],
        "query_id int, query_text string, k int")
    seed_map = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seeds_sorted)],
        ["query_id", "seed_id"])
    hits = (topk(qdf, index, tombstones=tombstones)
            .join(F.broadcast(seed_map), "query_id"))
    # the seed matches its own terms perfectly — exclude it (Solr MLT
    # never returns the source doc) and close the rank gap it leaves
    hits = hits.filter(F.col("seed_id") != F.col(id_col))
    w = Window.partitionBy("seed_id").orderBy(F.col("rank").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("seed_id", id_col, "score", "rank")
            .orderBy("seed_id", "rank"))
