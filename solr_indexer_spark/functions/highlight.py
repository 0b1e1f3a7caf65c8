"""Solr highlighting (``hl=true&hl.fl=<field>``): a query-term snippet
per hit, matched terms wrapped in ``<em>`` tags.

Deterministic, engine-independent contract (so an independent SQL
engine computes the identical snippet):

  * the snippet is built from the ANALYSIS tokens (analysis.py's
    lowercased ``[a-z0-9]+`` runs) — the same view of the text the
    match itself used, mirroring Solr's analyzed-field highlighting;
  * the fragment is the ±``window`` token neighborhood of the FIRST
    occurrence of any query term (smallest 1-based position across
    terms), clamped to the document bounds;
  * every fragment token equal to a query term is wrapped in
    ``pre``/``post``; tokens join with single spaces;
  * no query term in the doc -> NULL (Solr: no highlight entry).

Scale shape: a pure per-row JVM column expression (array_position /
slice / transform) — no shuffle, no UDF, pipelines inside whole-stage
codegen next to whatever projection serves the hit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analysis import tokenize_col


def highlight_col(text_col, terms: list[str], pre: str = "<em>",
                  post: str = "</em>", window: int = 3) -> Column:
    """Snippet column for ``text_col`` highlighted on ``terms``
    (literal analyzed terms — tokenize the user query first)."""
    if not terms:
        return F.lit(None).cast("string")
    toks = tokenize_col(text_col)
    first = F.array_min(F.filter(
        F.array(*[F.nullif(F.array_position(toks, F.lit(t)), F.lit(0))
                  for t in terms]),
        lambda c: c.isNotNull()))
    start = F.greatest(F.lit(1), first - F.lit(window))
    end = F.least(F.size(toks).cast("long"), first + F.lit(window))
    frag = F.slice(toks, start.cast("int"),
                   (end - start + F.lit(1)).cast("int"))
    term_arr = F.array(*[F.lit(t) for t in terms])
    wrapped = F.transform(
        frag,
        lambda t: F.when(F.array_contains(term_arr, t),
                         F.concat(F.lit(pre), t, F.lit(post)))
        .otherwise(t))
    return F.when(first.isNotNull(), F.array_join(wrapped, " "))


def highlight_terms_col(text_col, terms_col: Column, pre: str = "<em>",
                        post: str = "</em>", window: int = 3) -> Column:
    """Array-column variant of :func:`highlight_col`: ``terms_col`` is
    an ``array<string>`` of analyzed terms carried ON THE ROW (joined
    in per query_id). The batched-serving shape: a large query batch
    drives ONE expression off the array column instead of a per-query
    literal CASE branch — the Q-branch CaseWhen would blow Janino's
    64KB method limit exactly like the cursor path it mirrors
    (query/cursor.py). NULL or empty terms → NULL snippet, identical
    to the literal form's missing-terms behavior."""
    toks = tokenize_col(text_col)
    first = F.array_min(F.filter(
        F.transform(terms_col,
                    lambda t: F.nullif(F.array_position(toks, t),
                                       F.lit(0))),
        lambda c: c.isNotNull()))
    start = F.greatest(F.lit(1), first - F.lit(window))
    end = F.least(F.size(toks).cast("long"), first + F.lit(window))
    frag = F.slice(toks, start.cast("int"),
                   (end - start + F.lit(1)).cast("int"))
    wrapped = F.transform(
        frag,
        lambda t: F.when(F.array_contains(terms_col, t),
                         F.concat(F.lit(pre), t, F.lit(post)))
        .otherwise(t))
    return F.when(first.isNotNull(), F.array_join(wrapped, " "))
