"""Lucene-ish query-string surface — the syntax the reference's search
CLI passes straight to Solr (solrindexer/search.py:125-140 builds
``{q, rows, fl}``; reference README examples are free text on the
default ``full_text`` field plus ``field:value`` filters).

Supported subset, parsed into a :class:`ParsedQuery`:

  bare terms          BM25-scored (implicit OR — Lucene's default)
  "quoted phrase"     positional adjacency requirement + scored terms
  +term               MUST: doc must contain the term
  -term               MUST_NOT: doc must not contain the term
  field:value         metadata equality filter (non-text fields)

Execution composes existing engine pieces: BM25 scoring for the
should/must terms, array_contains gates for +/- terms, a positional
self-join for phrases, and plain column filters for fields — then the
standard (round(score,6) DESC, id ASC) rank contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import SCORE_DECIMALS, tokenize_col, tokenize_py

_TOKEN_SPLIT = re.compile(r'"([^"]*)"|(\S+)')


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)   # scored terms
    must: list[str] = field(default_factory=list)     # +term
    must_not: list[str] = field(default_factory=list)  # -term
    phrases: list[list[str]] = field(default_factory=list)
    filters: list[tuple[str, str]] = field(default_factory=list)  # field:value


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _TOKEN_SPLIT.finditer(q or ""):
        phrase, word = m.group(1), m.group(2)
        if phrase is not None:
            toks = tokenize_py(phrase)
            if toks:
                out.phrases.append(toks)
                out.should.extend(toks)    # phrase terms also score
            continue
        if ":" in word and not word.startswith(("+", "-")):
            fld, _, val = word.partition(":")
            if fld and val:
                out.filters.append((fld, val))
                continue
        if word.startswith("+"):
            out.must.extend(tokenize_py(word[1:]))
        elif word.startswith("-"):
            out.must_not.extend(tokenize_py(word[1:]))
        else:
            out.should.extend(tokenize_py(word))
    return out


def _phrase_pred(toks_col, phrase: list[str]):
    n = len(phrase)
    if n == 1:
        return F.array_contains(toks_col, phrase[0])
    conds = " AND ".join(
        f"element_at(_qtoks, i + {j}) = '{phrase[j]}'" for j in range(n))
    return F.expr(
        f"CASE WHEN size(_qtoks) < {n} THEN false ELSE "
        f"exists(sequence(1, size(_qtoks) - {n - 1}), i -> {conds}) END")


def search_lucene(q: str, docs: DataFrame, index, k: int = 10,
                  pos_postings: DataFrame | None = None) -> DataFrame:
    """Run a query-string search against an InvertedIndex + its doc
    table. Returns (<id>, score, rank). Gates (must/must_not/phrase/
    field filters) restrict the candidate set; BM25 over the scored
    terms ranks it; an all-gate query (no scored terms) ranks by id.

    With ``pos_postings`` (a positional index from
    index/positions.py:positional_postings), phrase gates run as
    index-side positional intersections — no document re-tokenization
    (Lucene behavior); otherwise they fall back to a doc-scan predicate.
    """
    from .scorer import score_exact
    pq = parse_query(q)
    id_col = index.id_col
    spark = docs.sparkSession

    gated = docs
    scan_phrases = pq.phrases if pos_postings is None else []
    if pq.must or pq.must_not or scan_phrases:
        gated = gated.withColumn("_qtoks", tokenize_col("text"))
        for t in pq.must:
            gated = gated.filter(F.array_contains(F.col("_qtoks"), t))
        for t in pq.must_not:
            gated = gated.filter(~F.array_contains(F.col("_qtoks"), t))
        for ph in scan_phrases:
            gated = gated.filter(_phrase_pred(F.col("_qtoks"), ph))
    if pos_postings is not None and pq.phrases:
        from ..index.positions import phrase_match_positions
        for ph in pq.phrases:
            matches = phrase_match_positions(pos_postings, ph, id_col=id_col)
            gated = gated.join(matches, id_col, "left_semi")
    for fld, val in pq.filters:
        gated = gated.filter(F.col(fld) == val)
    candidates = gated.select(F.col(id_col))

    scored_terms = pq.should + pq.must
    if scored_terms:
        queries = spark.createDataFrame(
            [(0, " ".join(scored_terms), k)],
            "query_id int, query_text string, k int")
        scored = score_exact(queries, index).drop("query_id")
        # semi-join onto the gated candidate set (gates are hard filters)
        scored = scored.join(candidates, id_col, "left_semi")
    else:
        scored = candidates.withColumn("score", F.lit(0.0))

    w = Window.orderBy(F.round(F.col("score"), SCORE_DECIMALS).desc(),
                       F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "score", "rank")
            .orderBy("rank"))
