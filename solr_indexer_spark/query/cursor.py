"""Solr cursorMark deep paging — the scale-correct alternative to
``start=``.

Offset paging (``start=N``, solrindexer/search.py:133's ``rows``/
``start`` request params) costs O(N+k) at every depth: each partition's
rank heap holds N+k candidates, N+k rows cross the final exchange, and
the rank window numbers N+k rows — page 1000 over a 100 TB corpus does
1000x the work of page 1, entirely to throw the first N rows away.

Cursor paging (Solr's ``cursorMark=*`` / ``nextCursorMark`` contract,
Lucene ``searchAfter``) pins the page boundary to a VALUE instead of an
offset: the (rounded score, doc id) rank tuple of the last row served.
The next page is then a plain top-k over the strictly-after-filtered
match set — heap depth k, transfer k, at ANY depth. The filter is a
pure per-row predicate, so it pipelines inside the decode/score stage
and never adds a shuffle.

Solr's contract, mirrored here:
  * the sort must end in the unique id tiebreak — our rank order
    (round(score, SCORE_DECIMALS) DESC, id ASC) always does;
  * ``cursorMark=*`` means "first page" (no filter);
  * the mark is an opaque serialized sort tuple, valid across index
    updates (a refreshed index just changes what sorts after it);
  * ``start`` must be 0 when a cursor is supplied.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import SCORE_DECIMALS

#: the "first page" cursor (Solr CursorMarkParams.CURSOR_MARK_START)
CURSOR_START = "*"

#: largest cursor batch inlined as a literal predicate (above this the
#: after-filter becomes a broadcast join — see apply_after)
_LITERAL_MAX = 16


def encode_cursor(score_r: float, doc_id) -> str:
    """Opaque mark from the rank tuple of a page's last row. The score
    MUST already be rounded to SCORE_DECIMALS — the rank-order contract
    rounds before comparing, so the cursor does too."""
    payload = json.dumps([float(score_r), doc_id],
                         separators=(",", ":"))
    return base64.urlsafe_b64encode(payload.encode()).decode()


def decode_cursor(mark: str) -> tuple | None:
    """(score_r, doc_id) from a mark; None for the start cursor."""
    if mark == CURSOR_START:
        return None
    score_r, doc_id = json.loads(
        base64.urlsafe_b64decode(mark.encode()).decode())
    return (float(score_r), doc_id)


def page_cursors(hits: DataFrame, id_col: str = "doc_id") -> dict:
    """{query_id: nextCursorMark} from a served page (a ``topk`` /
    ``topk_wand`` result with query_id/score/rank columns): the rank
    tuple of each query's LAST row, rounded IN Spark so the mark is
    bit-identical to the engine's own rank key (Java HALF_UP — never
    re-round driver-side, Python rounds half-to-even). Queries with an
    empty page have no entry (Solr: cursor unchanged = page exhausted).
    The collect is planning-sized: one row per query."""
    w = Window.partitionBy("query_id").orderBy(F.col("rank").desc())
    rows = (hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("query_id",
                    F.round("score", SCORE_DECIMALS).alias("_s"), id_col)
            .collect())
    return {int(r["query_id"]): encode_cursor(float(r["_s"]), r[id_col])
            for r in rows}


def page_cursor(hits: DataFrame, id_col: str = "doc_id") -> str | None:
    """nextCursorMark for a SINGLE-query page (the query-string paths
    ``search_tree``/``search_lucene`` return no query_id column): the
    rank tuple of the page's last row, rounded in Spark (see
    page_cursors). None for an empty page (cursor unchanged)."""
    rows = (hits.orderBy(F.col("rank").desc()).limit(1)
            .select(F.round("score", SCORE_DECIMALS).alias("_s"), id_col)
            .collect())
    if not rows:
        return None
    return encode_cursor(float(rows[0]["_s"]), rows[0][id_col])


def decode_cursors(marks: dict) -> dict:
    """{query_id: mark} -> the ``after=`` dict ``topk``/``topk_wand``
    take; start cursors drop out (no filter)."""
    out = {}
    for qid, mark in marks.items():
        tup = decode_cursor(mark)
        if tup is not None:
            out[int(qid)] = tup
    return out


def after_predicate(after: tuple, id_col: str):
    """Boolean column: row sorts strictly AFTER the cursor tuple in
    the rank order (round(score, SCORE_DECIMALS) DESC, id ASC). Pure
    literals — pipelines into whatever stage computes ``score``."""
    s, i = after
    sr = F.round(F.col("score"), SCORE_DECIMALS)
    return (sr < F.lit(float(s))) | \
        ((sr == F.lit(float(s))) & (F.col(id_col) > F.lit(i)))


def sort_after_predicate(after: tuple, sort: list, id_col: str):
    """Strictly-after predicate for an ARBITRARY Solr sort spec —
    cursorMark's general contract (any sort works as long as the
    unique key tiebreaks, which our rank orders always do).

    ``sort``: [(field, 'asc'|'desc'), ...] — the same spec the ranking
    used, with 'score' meaning the rounded relevance pseudo-field.
    ``after``: the cursor tuple (one value per sort field, then the
    id). Lexicographic: row is after the cursor iff some prefix of
    sort fields is equal and the next one sorts strictly later, or
    every sort field is equal and id > after-id. NULL sort values are
    not cursorable (Solr requires a sortMissingLast/First policy);
    rows with NULL in a sort field never satisfy the predicate."""
    *vals, aid = after
    if len(vals) != len(sort):
        raise ValueError("cursor tuple arity != sort spec arity")
    cond = F.col(id_col) > F.lit(aid)
    # build right-to-left: innermost is the id tiebreak
    for (fld, direction), v in zip(reversed(sort), reversed(vals)):
        c = (F.round(F.col("score"), SCORE_DECIMALS) if fld == "score"
             else F.col(fld))
        beyond = c < F.lit(v) if direction.lower() == "desc" \
            else c > F.lit(v)
        cond = beyond | ((c == F.lit(v)) & cond)
    return cond


def apply_after(scored: DataFrame, after: dict, id_col: str) -> DataFrame:
    """Keep rows strictly AFTER each query's cursor in the rank order
    (round(score, SCORE_DECIMALS) DESC, id ASC); queries absent from
    ``after`` pass through unfiltered (their first page).

    For serving-sized batches (≤ _LITERAL_MAX cursors) the predicate
    is inlined as literals — a pure pipelined filter, zero extra
    exchanges, which is the whole point of cursor paging: the deep
    page costs exactly a first page. Larger batches join a broadcast
    Q-row frame instead (a Q-branch literal CASE would blow the
    codegen method limit, the bucket_of lesson)."""
    if not after:
        return scored
    sr = F.round(F.col("score"), SCORE_DECIMALS)
    if len(after) <= _LITERAL_MAX:
        qid = F.col("query_id")
        cond = ~qid.isin([int(q) for q in after])
        for q, tup in after.items():
            cond = cond | ((qid == F.lit(int(q)))
                           & after_predicate(tup, id_col))
        return scored.filter(cond)
    spark = scored.sparkSession
    id_type = dict(scored.dtypes)[id_col]
    adf = spark.createDataFrame(
        [(int(q), float(s), i) for q, (s, i) in after.items()],
        f"query_id int, _a_score double, _a_id {id_type}")
    return (scored.join(F.broadcast(adf), "query_id", "left")
            .filter(F.col("_a_score").isNull()
                    | (sr < F.col("_a_score"))
                    | ((sr == F.col("_a_score"))
                       & (F.col(id_col) > F.col("_a_id"))))
            .drop("_a_score", "_a_id"))
