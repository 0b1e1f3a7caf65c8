"""spark-submit entry point: resumable index build.

  spark-submit --py-files solr_indexer_spark.zip jobs/build_index_job.py \\
      --input  /data/pages_parquet \\
      --output /data/index \\
      [--id-col url] [--shard-range 131072] [--group-size 8] [--run-id r1] \\
      [--positions]   (also persist the compressed positional store —
                       phrase/slop queries then run from the cold index)

Re-running after a kill resumes from the per-shard checkpoint manifest.
Exit code follows the reference contract (solrindexer/cli.py:270-276):
0 clean, 1 validation failures occurred (failed docs logged to
<output>/run_log, never indexed), 3 warnings only.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from solr_indexer_spark.extract import (exit_code, extract_pages,
                                        latest_wins, validate)
from solr_indexer_spark.index.codec import assign_doc_ids
from solr_indexer_spark.plans.resume import ResumableIndexBuild


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--shard-range", type=int, default=131072)
    ap.add_argument("--group-size", type=int, default=8)
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--positions", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.getOrCreate()
    pages = spark.read.parquet(args.input)
    good, run_log = validate(latest_wins(extract_pages(pages)))
    run_log.write.mode("overwrite").parquet(f"{args.output}/run_log")

    docs = good if args.id_col == "doc_id" else \
        assign_doc_ids(good, id_col=args.id_col)
    build = ResumableIndexBuild(args.output, run_id=args.run_id,
                                shard_range=args.shard_range,
                                group_size=args.group_size,
                                positions=args.positions)
    counters = build.run(docs)
    print(f"index build complete: {counters}")
    if args.id_col != "doc_id":
        docs.select("doc_id", args.id_col).write.mode("overwrite") \
            .parquet(f"{args.output}/doc_map")
    return exit_code(run_log)


if __name__ == "__main__":
    sys.exit(main())
