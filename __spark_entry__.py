"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB-checkable oracle. Implementations live in
``solr_indexer_spark.gate`` (engine-backed Spark paths) — the SQL
oracles are independent re-derivations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from solr_indexer_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(gate.ORACLE_SQL)


# queries() entries deliberately WITHOUT an oracle — the driver records
# a rows-only check for these; recall-vs-brute is asserted in
# tests/test_operators.py instead. After r6's `ann_ivf_fixed_cells`
# gate (fixed injected centroids → the full assignment/prune/rank
# serving path IS hash-checked against DuckDB), the only oracle-free
# surface left in these two is the iterative k-means / PQ TRAINING
# itself (Lloyd's iterations are not SQL-expressible).
NO_ORACLE_OK = frozenset({"ann_ivf_topk", "ann_ivf_pq_topk"})
