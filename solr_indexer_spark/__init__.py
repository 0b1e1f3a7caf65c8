"""solr_indexer_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch re-expression of the capabilities of metno/solr-indexer
(reference at /root/reference): the reference is an ETL + query *client*
for Apache Solr; everything that makes it a search engine (tokenization,
inverted index, posting lists, BM25 ranking, top-k, faceting, updates,
deletes, realtime get) lives inside Solr/Lucene. This package implements
both layers Spark-first:

  (A) ingest pipeline with the reference's document semantics
      (deterministic per-record extraction, validation gates,
      failure/warning ledger, referential integrity, resumability), and
  (B) the engine Solr provided: inverted-index build (docID-delta +
      varbyte compressed posting blocks with skip pointers and per-block
      max scores), salted term-partitioned merge, BM25 (k1=1.2, b=0.75,
      Lucene idf) top-k via block-max WAND.

Design stance: DataFrame/SQL + Arrow-vectorized pandas UDFs throughout;
no per-row Python; deterministic tokenizer / ids / tie-breaks so results
are rank-identical to the pure-Python oracle (the sandbox stand-in for
Lucene).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
