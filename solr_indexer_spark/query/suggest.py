"""Solr terms component / suggester (``terms.prefix=`` /
``suggest.q=``): prefix completion from the term dictionary, most
frequent terms first — plus the spellcheck component
(``spellcheck.q=``): did-you-mean corrections by edit distance.

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


def spellcheck(index, term: str, max_edits: int = 2,
               count: int = 5) -> DataFrame:
    """Solr spellcheck component (``spellcheck.q=``): dictionary
    corrections for a (possibly misspelled) term — candidates within
    ``max_edits`` Levenshtein of the input, closest first, document
    frequency breaking distance ties (DirectSolrSpellChecker's
    score-then-freq order), term asc as the final tiebreak. The input
    term itself is excluded (a correctly-spelled term needs no
    correction row).

    Scale shape: same as the fuzzy-query expansion (qtree FuzzyN) —
    a length-window prefilter (|len(t)−len(q)| ≤ max_edits) prunes
    the dictionary scan before the Levenshtein evaluates, and the
    top-count cut is a TakeOrderedAndProject."""
    from pyspark.sql import Window
    t = term.lower()
    ts = index.term_stats
    if "tlen" in ts.columns:
        # persisted dictionaries carry a stored term-length column
        # (persist_index clusters rows by it): a BETWEEN on the plain
        # column pushes into the parquet scan and prunes row groups —
        # the computed |length(term)−n| expression below cannot
        ts = ts.filter(F.col("tlen").between(len(t) - max_edits,
                                             len(t) + max_edits))
    cand = (ts
            .filter(F.abs(F.length("term") - F.lit(len(t)))
                    <= F.lit(max_edits))
            .filter(F.col("term") != t)
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("dist") <= max_edits)
            .select("term", "df", "dist"))
    order = [F.col("dist").asc(), F.col("df").desc(),
             F.col("term").asc()]
    ranked = cand.orderBy(*order).limit(count)
    # numbers only the <= count survivors of the limit above
    w = Window.orderBy(*order)
    return ranked.withColumn("pos", F.row_number().over(w))


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
