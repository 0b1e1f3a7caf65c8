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


def _sloppy_window_pred(n_terms: int, slop: int) -> F.Column:
    """Match predicate over the joined per-term SHIFTED position arrays
    ``_p0.._p{n-1}`` (each already offset by its phrase index).

    slop=0: classic intersection (all shifted arrays share a point).
    slop>0: spanNear-style window — the phrase matches iff some choice
    of one shifted position per term fits in a window of width ``slop``
    (max − min ≤ slop). For 2 terms this is exactly Lucene's
    SloppyPhraseQuery cost |Δ| ≤ slop (a transposition costs 2);
    for longer phrases it is the spanNear window formulation (Lucene's
    multi-term total-movement minimization differs on exotic cases, and
    repeated phrase terms may reuse one occurrence — documented
    deviation). Because any achievable window minimum IS one of the
    shifted positions, it suffices to test window starts drawn from the
    union of the arrays: exists w ∈ ∪_i p_i such that every term has a
    shifted position in [w, w+slop]. All array algebra is JVM-side
    (nested higher-order functions, no UDF)."""
    if slop == 0:
        common = reduce(lambda acc, i: F.array_intersect(acc, F.col(f"_p{i}")),
                        range(1, n_terms), F.col("_p0"))
        return F.size(common) > 0
    ws = F.concat(*[F.col(f"_p{i}") for i in range(n_terms)])

    def fits(w):
        # 1-arg inner lambdas (a defaulted 2nd param would make Spark
        # treat it as the 2-arg (element, index) form); w is captured
        # from the enclosing scope, fixed per fits() call
        conds = [F.exists(F.col(f"_p{i}"),
                          lambda x: (x >= w) & (x <= w + F.lit(slop)))
                 for i in range(n_terms)]
        return reduce(lambda a, b: a & b, conds)

    return F.exists(ws, fits)


def _sloppy_exact_pred(phrase: list[str], slop: int):
    """Arrow-batched exact matcher for sloppy phrases with REPEATED
    terms: Lucene requires an INJECTIVE assignment of positions to the
    phrase slots (one occurrence cannot serve two slots). Injectivity
    only matters within slots of the same term — distinct terms never
    share a token position — so per window start w each term's slots do
    a greedy interval matching (windows sorted by slot offset, take the
    smallest unused position; exchange-argument optimal). Runs only on
    docs that already survived the n-way positional join."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T
    groups: dict[str, list[int]] = {}
    for j, t in enumerate(phrase):
        groups.setdefault(t, []).append(j)
    grp = list(groups.values())

    @pandas_udf(T.BooleanType())
    def pred(*cols: pd.Series) -> pd.Series:
        out = []
        for arrays in zip(*cols):
            ws = sorted({int(x) for a in arrays for x in a})
            ok = False
            for w in ws:
                good = True
                for slots in grp:
                    used: set = set()
                    for j in slots:          # windows ordered by offset
                        cands = sorted(int(x) + j for x in arrays[j]
                                       if w <= x <= w + slop)
                        pick = next((c for c in cands if c not in used),
                                    None)
                        if pick is None:
                            good = False
                            break
                        used.add(pick)
                    if not good:
                        break
                if good:
                    ok = True
                    break
            out.append(ok)
        return pd.Series(out)

    return pred


def phrase_match_positions(pos_postings: DataFrame, phrase: list[str],
                           id_col: str = "doc_id",
                           slop: int = 0) -> DataFrame:
    """Doc ids containing the phrase (within ``slop`` — Lucene
    ``"a b"~N``), from the positional index alone. Empty phrase or
    missing terms → empty result."""
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
    if slop > 0 and len(set(phrase)) < len(phrase):
        # repeated terms: the window predicate could reuse one
        # occurrence for two slots — exact injective matcher instead
        pred = _sloppy_exact_pred(phrase, slop)
        cols = [F.col(f"_p{i}") for i in range(len(phrase))]
        return (joined.filter(pred(*cols))
                .select(id_col).orderBy(id_col))
    return (joined.filter(_sloppy_window_pred(len(phrase), slop))
            .select(id_col).orderBy(id_col))


# ---------------------------------------------------------------------------
# Compressed positional lists (NEXT r1 #2): positions are delta-encoded
# through the SAME tagged dual codec (varbyte/FOR) as the score
# postings — Lucene compresses positions inside the identical postings
# format. Encoding is one vectorized _pack_streams pass per Arrow
# batch (all rows concatenated, never one tiny array at a time).
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_POS_SCHEMA = None  # filled lazily to avoid import order issues


def _encode_positions_map(it):
    from .codec import _pack_streams
    for pdf in it:
        arrays = [np.asarray(a, np.int64) for a in pdf["positions"]]
        lens = np.array([a.size for a in arrays], np.int64)
        if lens.sum() == 0:
            continue
        conc = np.concatenate(arrays)
        ends = np.cumsum(lens)
        starts = ends - lens
        deltas = np.empty_like(conc)
        deltas[1:] = conc[1:] - conc[:-1]
        deltas[starts] = conc[starts]          # row-start = absolute pos
        blobs = _pack_streams(deltas.astype(np.uint64), starts, ends)
        out = pdf.drop(columns=["positions"]).copy()
        out["pos_blob"] = blobs
        out["n_pos"] = lens.astype("int32")
        yield out


def positional_postings_compressed(docs: DataFrame, id_col: str = "doc_id",
                                   text_col: str = "text") -> DataFrame:
    """(term, <id>, pos_blob binary, n_pos) — compressed positional
    index; phrase queries decode only the query terms' rows."""
    pos = positional_postings(docs, id_col, text_col)
    schema = T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("pos_blob", T.BinaryType()),
        T.StructField("n_pos", T.IntegerType()),
    ])
    return pos.mapInPandas(_encode_positions_map, schema=schema)


@pandas_udf(T.ArrayType(T.IntegerType()))
def _decode_positions_udf(blobs: pd.Series) -> pd.Series:
    from .codec import decode_stream
    return blobs.map(lambda b: np.cumsum(
        decode_stream(bytes(b)).astype(np.int64)).astype(np.int32).tolist())


N_TERM_BUCKETS = 64


def term_bucket_py(term: str, n: int = N_TERM_BUCKETS) -> int:
    """Driver-side mirror of the Spark-side bucket expression
    ``pmod(crc32(term), n)`` — zlib.crc32 over UTF-8 bytes, exactly
    Spark's crc32 semantics (pinned by a test)."""
    import zlib
    return zlib.crc32(term.encode("utf-8")) % n


def term_bucket_col(term_col, n: int = N_TERM_BUCKETS):
    return F.pmod(F.crc32(term_col.cast("string")), F.lit(n)).cast("int")


def phrase_match_positions_compressed(pos_comp: DataFrame,
                                      phrase: list[str],
                                      id_col: str = "doc_id",
                                      slop: int = 0) -> DataFrame:
    """Same positional intersection as phrase_match_positions, reading
    the compressed table — only the phrase terms' rows are ever
    decoded (Arrow-batched). When the table carries a ``tbucket``
    column (the streaming writer's term-hash layout), each term's
    filter also pins its bucket, so the scan prunes to 1/N of the
    positional files at the PARTITION level (directory pruning —
    without it a phrase query at web scale reads the whole positional
    index and filters)."""
    spark = pos_comp.sparkSession
    if not phrase:
        return spark.createDataFrame([], f"{id_col} long")
    bucketed = "tbucket" in pos_comp.columns

    def shift_by(off: int):
        return lambda p: p - F.lit(off)

    sides = []
    for i, term in enumerate(phrase):
        side = pos_comp.filter(F.col("term") == term)
        if bucketed:
            side = side.filter(
                F.col("tbucket") == F.lit(term_bucket_py(term)))
        side = side.select(
            F.col(id_col),
            F.transform(_decode_positions_udf(F.col("pos_blob")),
                        shift_by(i)).alias(f"_p{i}"))
        sides.append(side)
    joined = reduce(lambda a, b: a.join(b, id_col), sides)
    if slop > 0 and len(set(phrase)) < len(phrase):
        pred = _sloppy_exact_pred(phrase, slop)
        cols = [F.col(f"_p{i}") for i in range(len(phrase))]
        return (joined.filter(pred(*cols))
                .select(id_col).orderBy(id_col))
    return (joined.filter(_sloppy_window_pred(len(phrase), slop))
            .select(id_col).orderBy(id_col))


def phrase_match(pos_postings: DataFrame, phrase: list[str],
                 id_col: str = "doc_id", slop: int = 0) -> DataFrame:
    """Dispatch on the positional table's schema: raw array<int>
    positions or codec-compressed pos_blob."""
    if "pos_blob" in pos_postings.columns:
        return phrase_match_positions_compressed(pos_postings, phrase,
                                                 id_col, slop)
    return phrase_match_positions(pos_postings, phrase, id_col, slop)
