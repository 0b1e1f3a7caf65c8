"""Solr terms component / suggester (``terms.prefix=`` /
``suggest.q=``): prefix completion from the term dictionary, most
frequent terms first.

Reference surface: the Solr core behind the reference exposes
/terms and the suggesters built over the same field dictionaries.

Scale shape: a single pruned scan of term_stats — `startswith` is a
plain StartsWith predicate, so it pushes into the parquet scan
(PushedFilters) and only the prefix's dictionary rows ever reach the
executor; the top-count heap is a TakeOrderedAndProject. No driver
dictionary needed (works the same against a 10⁹-term vocabulary where
the pinned dict is unavailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest(index, prefix: str, count: int = 10) -> DataFrame:
    """(term, df, pos) — the ``count`` highest-df dictionary terms
    starting with ``prefix`` (Solr terms.sort=count default; term asc
    tiebreak, Lucene's deterministic order), pos = 1-based rank."""
    from pyspark.sql import Window
    ranked = (index.term_stats
              .filter(F.col("term").startswith(prefix))
              .select("term", "df")
              .orderBy(F.col("df").desc(), F.col("term").asc())
              .limit(count))
    # the window numbers only the <= count surviving rows of the
    # TakeOrderedAndProject above — not the dictionary
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return ranked.withColumn("pos", F.row_number().over(w))
