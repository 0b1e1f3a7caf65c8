"""Solr stats component (``stats=true&stats.field=f``) over a result
set: count / missing / min / max / sum / mean / stddev / percentiles
of a stored numeric field across the docs matching a query.

Reference surface: the Solr core the reference posts to exposes the
StatsComponent on every request handler; the reference itself consumes
aggregate shapes through its failure analytics (solrindexer/
failure_tracker.py:126-171) — this is the engine-side generalization.

Scale shape: ONE partial-aggregable pass over the hits⋈field frame —
every statistic here (including the exact interpolated percentile,
which Spark computes with a per-partition digest merge) map-side
combines, so the shuffle carries one partial row per partition, not
the result set. ``exact=False`` swaps in ``percentile_approx``
(t-digest, bounded memory) for 100 TB-sized result sets where an exact
percentile's per-partition value buffer is not worth the last decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_stats(hits: DataFrame, docs: DataFrame, field: str,
                id_col: str = "doc_id",
                percentiles: tuple = (0.25, 0.5, 0.75, 0.9),
                exact: bool = True) -> DataFrame:
    """Long-format stats rows ``(stat string, val double)`` for
    ``field`` over the docs in ``hits`` (any frame carrying the id
    column — a top-k page or a full match set).

    The hits side is the small one by construction (a result set) —
    broadcast it against the doc table so the field scan stays
    pipelined and only matched rows aggregate."""
    joined = (docs.select(id_col, field)
              .join(F.broadcast(hits.select(id_col).distinct()), id_col))
    c = F.col(field).cast("double")
    pct_fn = F.percentile if exact else F.percentile_approx
    aggs = [
        F.count(c).alias("count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0))
         .cast("double").alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
    ] + [pct_fn(c, F.lit(p)).alias(f"p{int(p * 100)}")
         for p in percentiles]
    wide = joined.agg(*aggs)
    # one-row wide frame -> long (stat, val): a pure projection on the
    # aggregate's single output row, no extra job
    return wide.selectExpr(
        "stack({}, {}) as (stat, val)".format(
            len(wide.columns),
            ", ".join(f"'{n}', cast(`{n}` as double)"
                      for n in wide.columns)))
