"""spark-submit entry point: BM25 top-k over a built index.

  spark-submit --py-files solr_indexer_spark.zip jobs/query_job.py \\
      --index /data/index \\
      --query "climate data" [--k 10] [--output /data/hits] [--lucene]

Prints (or writes) (query_id, doc_id, score, rank); joins back the
original id column when the build produced a doc_map. With --lucene
each query string runs through the boolean query-string engine
(grouping, AND/OR/NOT, wildcards, fuzzy, boosts; phrase/slop gates
need the persisted positional store — build with --positions — since
the cold index has no corpus to re-tokenize). field:value / range
clauses resolve against the doc_map columns (doc_id + the original id
column); clauses naming other stored fields need a doc table this job
does not carry and fail with Spark's unresolved-column error.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from solr_indexer_spark.plans.resume import ResumableIndexBuild
from solr_indexer_spark.query.wand import topk_wand


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True,
                    help="repeatable; one top-k run per query")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--start", type=int, default=0,
                    help="Solr offset paging (absolute ranks)")
    ap.add_argument("--cursor", default=None,
                    help="cursorMark deep paging: '*' or a mark printed "
                         "by a previous run (mutually exclusive with "
                         "--start; requires exactly one --query — marks "
                         "are query-specific)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--lucene", action="store_true",
                    help="boolean query-string engine (qtree) per query")
    args = ap.parse_args(argv)
    after_tup = None
    if args.cursor is not None:
        if len(args.query) != 1:
            # a cursor mark encodes ONE query's rank position; applying
            # it to other queries silently skips their true head rows
            # (ADVICE r6)
            ap.error("--cursor requires exactly one --query "
                     "(cursor marks are query-specific)")
        from solr_indexer_spark.query.cursor import decode_cursor
        after_tup = decode_cursor(args.cursor)

    spark = SparkSession.builder.getOrCreate()
    build = ResumableIndexBuild(args.index)
    bindex = build.load(spark)
    if args.lucene:
        from solr_indexer_spark.query.parser import search_lucene
        view = bindex.as_logical_index()
        pos = build.load_positional(spark)
        try:
            # doc_map carries (doc_id, original id col) — the doc frame
            # for field:value clauses on the id column
            docs_frame = spark.read.parquet(f"{args.index}/doc_map")
        except Exception:
            docs_frame = view.postings.select("doc_id").distinct()
        # several queries × several actions each — pay the postings
        # scan / parquet read once
        docs_frame = docs_frame.cache()
        docs_frame.count()
        parts = []
        for i, q in enumerate(args.query):
            one = search_lucene(q, docs_frame, view, k=args.k,
                                pos_postings=pos, start=args.start,
                                after=after_tup) \
                .withColumn("query_id", F.lit(i))
            parts.append(one.select("query_id", "doc_id", "score", "rank"))
        hits = parts[0]
        for x in parts[1:]:
            hits = hits.unionByName(x)
    else:
        queries = spark.createDataFrame(
            [(i, q, args.k) for i, q in enumerate(args.query)],
            "query_id int, query_text string, k int")
        after = (None if after_tup is None
                 else {i: after_tup for i in range(len(args.query))})
        hits = topk_wand(queries, bindex, start=args.start, after=after)
    try:
        doc_map = spark.read.parquet(f"{args.index}/doc_map")
        hits = hits.join(F.broadcast(doc_map), "doc_id", "left")
    except Exception:
        pass  # doc_id-keyed build: no map
    if args.output:
        hits.write.mode("overwrite").parquet(args.output)
    else:
        hits.show(100, truncate=False)
    if args.cursor is not None:
        # complete the cursorMark contract: print each query's mark for
        # the NEXT page (absent = that query's results are exhausted)
        from solr_indexer_spark.query.cursor import page_cursors
        for qid, mark in sorted(page_cursors(hits).items()):
            print(f"nextCursorMark[{qid}]={mark}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
