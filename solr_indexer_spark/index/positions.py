"""Positional postings — the index-side phrase-query support Lucene
keeps inside its postings (positions per (term, doc)); the reference
reaches it through Solr phrase queries on ``full_text``.

The phrase algorithm is the classic positional intersection: a phrase
[t0, t1, ..., tn] matches doc d iff

    P(t0, d) ∩ (P(t1, d) - 1) ∩ ... ∩ (P(tn, d) - n)  ≠ ∅

expressed as an n-way equi-join on the doc id (each side is one term's
positional list — a broadcast-friendly slice of the index) followed by
JVM-side array_intersect/transform. No re-tokenization of documents at
query time — the whole point of carrying positions in the index.

Scale notes: positional lists multiply index size by ~avg tf; at web
scale they live in their own table (column pruning keeps scoring-only
queries from reading them), hash-distributed by term like the score
postings. Delta+varbyte compression of positions plugs into the same
codec (index/codec.py vb_encode) when needed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import tokens_with_pos


def positional_postings(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(term, <id>, positions sorted array<int>)."""
    tok = tokens_with_pos(docs, id_col, text_col)
    return (tok.groupBy("term", id_col)
            .agg(F.sort_array(F.collect_list("pos")).alias("positions")))


def phrase_match_positions(pos_postings: DataFrame, phrase: list[str],
                           id_col: str = "doc_id") -> DataFrame:
    """Doc ids containing the exact phrase, from the positional index
    alone. Empty phrase or missing terms → empty result."""
    spark = pos_postings.sparkSession
    if not phrase:
        return spark.createDataFrame([], f"{id_col} long")
    def shift_by(off: int):
        # single-param lambda: a 2-param lambda would receive the ARRAY
        # INDEX as its second argument (F.transform's (el, idx) form)
        return lambda p: p - F.lit(off)

    sides = []
    for i, term in enumerate(phrase):
        side = (pos_postings.filter(F.col("term") == term)
                .select(F.col(id_col),
                        F.transform("positions", shift_by(i)).alias(f"_p{i}")))
        sides.append(side)
    joined = reduce(lambda a, b: a.join(b, id_col), sides)
    common = reduce(lambda acc, i: F.array_intersect(acc, F.col(f"_p{i}")),
                    range(1, len(phrase)), F.col("_p0"))
    return (joined.filter(F.size(common) > 0)
            .select(id_col).orderBy(id_col))
