"""Solr faceting beyond plain field counts: range facets
(``facet.range=f&facet.range.start/end/gap`` — bucketed counts of a
numeric field over a result set, EVERY bucket emitted including empty
ones, exactly as Solr's response does) and the JSON Facet API's terms
facet with nested stat sub-facets (``json.facet``).

Reference surface: the Solr core behind the reference serves
facet.range on every handler (the reference's own *_facet fields are
term facets, SURVEY A7; range facets are the numeric/date sibling).

Scale shape: one broadcast of the hit set, one map-side-combinable
groupBy on a computed bucket key (floor((v-start)/gap) — a pure
projection), then a left join from the bucket spine so empty buckets
survive. The spine is driver-generated and planning-sized by
construction (ceil((end-start)/gap) rows — Solr requests with
pathological gap counts are rejected the same way Solr rejects them).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: largest bucket spine a single request may generate (Solr guards
#: facet.range the same way — a tiny gap over a wide range is a
#: request error, not a 10⁹-row driver list)
MAX_BUCKETS = 100_000


#: nested aggregate constructors the JSON-facet surface accepts —
#: Solr's stat facet functions (json.facet: sum/avg/min/max/unique)
_SUBAGGS = {
    "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
    "unique": F.count_distinct,
}


def facet_terms(hits: DataFrame, docs: DataFrame, field: str,
                stats: dict | None = None, limit: int = 10,
                id_col: str = "doc_id") -> DataFrame:
    """Solr JSON Facet API terms facet (``json.facet={f:{type:terms,
    field:f, facet:{...}}}``): buckets of ``field`` over the result
    set, ordered by count desc (Solr's default sort; field-value asc
    tiebreak), each bucket carrying nested stat sub-facets.

    ``stats``: {output_name: (fn, column)} with fn one of
    sum/avg/min/max/unique — e.g. {"avg_len": ("avg", "n_chars")}.

    Scale shape: ONE map-side-combinable groupBy computes the bucket
    count and every nested stat together (Solr computes them in one
    pass over the matched docs too); the top-``limit`` bucket cut is
    a TakeOrderedAndProject. NULL field values are skipped (Solr
    terms facets bucket only present values unless missing:true)."""
    stats = stats or {}
    bad = [fn for fn, _ in stats.values() if fn not in _SUBAGGS]
    if bad:
        raise ValueError(f"unknown facet stat fn(s): {bad}; "
                         f"supported: {sorted(_SUBAGGS)}")
    cols = [id_col, field] + sorted({c for _, c in stats.values()
                                     if c != field})
    joined = (docs.select(*cols)
              .join(F.broadcast(hits.select(id_col).distinct()), id_col)
              .filter(F.col(field).isNotNull()))
    aggs = [F.count("*").alias("count")]
    for name, (fn, col) in sorted(stats.items()):
        aggs.append(_SUBAGGS[fn](F.col(col)).alias(name))
    return (joined.groupBy(field).agg(*aggs)
            .orderBy(F.col("count").desc(), F.col(field).asc())
            .limit(limit))


def facet_pivot(hits: DataFrame, docs: DataFrame, fields: list,
                id_col: str = "doc_id") -> DataFrame:
    """Solr pivot faceting (``facet.pivot=f1,f2,...``): the full
    hierarchical count tree — counts at every prefix level of the
    field list — over a result set.

    Returns one row per tree node: the pivot columns (deeper levels
    NULL above their level), ``level`` (1-based depth), and ``n``.
    The root grand-total row is omitted (Solr's response starts at
    the first field).

    Scale shape: Spark's ``rollup`` computes EVERY level in one
    map-side-combinable pass (partial aggregates per level share the
    scan) — no per-level groupBy jobs; rows with a NULL field value
    at their own level are dropped (terms facets bucket only present
    values), distinguished from rollup-generated NULLs by
    ``grouping()``."""
    if not fields:
        raise ValueError("facet.pivot needs at least one field")
    joined = (docs.select(id_col, *fields)
              .join(F.broadcast(hits.select(id_col).distinct()), id_col))
    gcols = [F.grouping(f).alias(f"_g_{f}") for f in fields]
    out = joined.rollup(*fields).agg(F.count("*").alias("n"), *gcols)
    # level = number of fields actually grouped (grouping()=0);
    # rollup only produces prefixes, so level identifies the node depth
    level = sum((F.lit(1) - F.col(f"_g_{f}") for f in fields[1:]),
                F.lit(1) - F.col(f"_g_{fields[0]}"))
    out = out.withColumn("level", level.cast("int")) \
        .filter(F.col("level") >= 1)
    # a NULL at the node's own level is a missing VALUE (drop it, the
    # terms-facet rule), not a rollup subtotal
    for i, f in enumerate(fields):
        out = out.filter((F.col("level") < i + 1)
                         | F.col(f).isNotNull())
    return (out.select(*fields, "level", "n")
            .orderBy("level", *fields))


def facet_range(hits: DataFrame, docs: DataFrame, field: str,
                start: float, end: float, gap: float,
                id_col: str = "doc_id") -> DataFrame:
    """(lo, hi, n) per bucket [lo, lo+gap) over ``field`` across the
    docs in ``hits``; values outside [start, end) don't count (Solr's
    default include/other handling); empty buckets emit n=0."""
    if gap <= 0 or end <= start:
        raise ValueError("facet.range requires gap > 0 and end > start")
    n_buckets = math.ceil((end - start) / gap)
    if n_buckets > MAX_BUCKETS:
        raise ValueError(f"facet.range would create {n_buckets} buckets "
                         f"(max {MAX_BUCKETS}) — widen gap")
    spark = docs.sparkSession
    spine = spark.createDataFrame(
        [(float(start + i * gap), float(min(start + (i + 1) * gap, end)))
         for i in range(n_buckets)], "lo double, hi double")
    v = F.col(field).cast("double")
    joined = (docs.select(id_col, field)
              .join(F.broadcast(hits.select(id_col).distinct()), id_col)
              .filter(v.isNotNull() & (v >= F.lit(float(start)))
                      & (v < F.lit(float(end)))))
    lo = (F.floor((v - F.lit(float(start))) / F.lit(float(gap)))
          * F.lit(float(gap)) + F.lit(float(start)))
    counts = joined.groupBy(lo.alias("lo")).agg(F.count("*").alias("n"))
    return (spine.join(counts, "lo", "left")
            .select("lo", "hi",
                    F.coalesce(F.col("n"), F.lit(0)).alias("n"))
            .orderBy("lo"))
