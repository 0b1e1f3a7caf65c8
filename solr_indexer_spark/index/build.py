"""Inverted-index construction — the engine-side analogue of what the
reference delegates to Solr's indexer (implied contract; see SURVEY §2.9).

Logical tables produced (the "index"):

  doc_stats   (doc id, dl)                 one row per indexed doc
  term_stats  (term, df, cf)               document/collection frequency
  corpus_stats(n_docs, avgdl)              single row
  postings    (term, <id>, tf, dl)         v0 "raw" postings — one row
                                           per (term, doc); dl is
                                           denormalized in (Lucene keeps
                                           norms alongside postings for
                                           the same reason: scoring a
                                           posting must not need a
                                           doc-table join)

Scale notes (the part that must survive 10^12 docs):
  * postings_raw is a single map-side-combinable aggregation:
    ``groupBy(term, id).count()`` — partial aggregation happens before
    the shuffle, so the shuffle volume is the posting count, not the
    token count.
  * term_stats / corpus_stats are pure aggregations with partial merge
    (the reference's per-process partial counters merged in the parent,
    solrindexer/cli.py:446-490, are exactly Spark's partial/final agg).
  * the Zipf head problem (a term like "the" appearing in ~every doc)
    does NOT skew postings_raw: the groupBy key is (term, id), which is
    near-unique. Skew only appears when grouping by term alone — that
    path (block building) uses the salted two-phase merge in
    ``index/codec.py`` per the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_col


@dataclass
class InvertedIndex:
    """Handle bundling the logical index tables + the id column name."""

    id_col: str
    doc_stats: DataFrame
    term_stats: DataFrame
    corpus_stats: DataFrame
    postings: DataFrame          # (term, id, tf, dl)

    _n_avgdl: tuple | None = None

    def n_and_avgdl(self) -> tuple[int, float]:
        if self._n_avgdl is None:   # one collect per index, not per query
            row = self.corpus_stats.collect()[0]
            self._n_avgdl = (int(row["n_docs"]), float(row["avgdl"]))
        return self._n_avgdl


def tokens_with_pos(docs: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, pos, term) — positional tokens (phrase queries need pos)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(tokenize_col(text_col)).alias("pos", "term"),
    )


def build_index(docs: DataFrame, id_col: str = "url",
                text_col: str = "text") -> InvertedIndex:
    """Build the v0 logical index from a validated docs DataFrame."""
    toks = docs.select(F.col(id_col), tokenize_col(text_col).alias("_toks"))
    doc_stats = toks.select(F.col(id_col), F.size("_toks").alias("dl"))

    # dl rides through the explode: (term, id, dl) has the same group
    # cardinality as (term, id) — the Lucene-norms denormalization costs
    # no extra shuffle and removes a postings⋈doc_stats join entirely
    flat = toks.select(F.col(id_col), F.size("_toks").alias("dl"),
                       F.explode("_toks").alias("term"))
    postings = (flat.groupBy("term", id_col, "dl")
                .agg(F.count("*").alias("tf"))
                .select("term", id_col, "tf", "dl"))

    term_stats = (postings.groupBy("term")
                  .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
    corpus_stats = doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(0.0)).alias("avgdl"))
    return InvertedIndex(id_col=id_col, doc_stats=doc_stats,
                         term_stats=term_stats, corpus_stats=corpus_stats,
                         postings=postings)


def persist_index(index: InvertedIndex, base_dir: str,
                  term_buckets: int = 32) -> None:
    """Materialize the index, postings hash-distributed by term.

    ``repartition(term_buckets, term)`` + sorted-within-partition gives
    the physical layout block-max WAND prunes on (a query touches only
    the files whose bucket holds its terms). In production this is an
    Iceberg table bucketed by term; locally parquet files partitioned by
    a bucket column carry the same pruning information.
    """
    p = (index.postings
         .withColumn("bucket", F.pmod(F.hash("term"), F.lit(term_buckets)))
         .repartition(term_buckets, "bucket")
         .sortWithinPartitions("term", index.id_col))
    p.write.mode("overwrite").partitionBy("bucket").parquet(f"{base_dir}/postings")
    index.doc_stats.write.mode("overwrite").parquet(f"{base_dir}/doc_stats")
    # term_stats persists with a stored term-length column, rows
    # clustered by it: the spellcheck length window (|len(t)−len(q)| ≤
    # max_edits) becomes a plain range predicate on ``tlen`` that
    # parquet min/max row-group stats can prune — without it every
    # spellcheck call scans the whole dictionary (VERDICT r6 #2, the
    # ``tbucket`` trick applied to the length axis)
    (index.term_stats.withColumn("tlen", F.length("term"))
     .sortWithinPartitions("tlen", "term")
     .write.mode("overwrite").parquet(f"{base_dir}/term_stats"))
    index.corpus_stats.write.mode("overwrite").parquet(f"{base_dir}/corpus_stats")


def doc_tfidf(index: InvertedIndex) -> DataFrame:
    """(term, <id>, tfidf) sparse document vectors — the tf-idf export
    a training pipeline feeds to clustering / linear probes. idf is the
    BM25-family smoothed form ln(1 + (N - df + .5)/(df + .5)); tf is
    raw term frequency. One broadcast join against term_stats — the
    postings table is never shuffled."""
    from ..analysis import idf_col
    n_docs, _ = index.n_and_avgdl()
    return (index.postings
            .join(F.broadcast(index.term_stats.select("term", "df")), "term")
            .select("term", index.id_col,
                    (F.col("tf") * idf_col(F.col("df"), F.lit(n_docs)))
                    .alias("tfidf")))
