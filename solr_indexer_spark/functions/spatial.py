"""Spatial scalar functions: bbox predicates and geometry-string
generation — the engine-side model of what the reference pushes into
Solr's BBoxField/RPT index (docstring reference solrindexer/spatial.py:20-27).

Spark has no native geo type; the model (per SURVEY §1.2) is four float
bbox columns for predicates plus deterministic WKT/ENVELOPE string
columns for storage. All pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def envelope_string(west, east, north, south) -> Column:
    """'ENVELOPE(minX, maxX, maxY, minY)' CQL string
    (solrindexer/spatial.py:86-112; field at spatial.py:43)."""
    w, e, n, s = [F.col(c) if isinstance(c, str) else c
                  for c in (west, east, north, south)]
    return F.format_string("ENVELOPE(%s, %s, %s, %s)",
                           w.cast("string"), e.cast("string"),
                           n.cast("string"), s.cast("string"))


def parse_envelope(col) -> Column:
    """ENVELOPE string → struct(west, east, north, south), rounded to
    9 decimals (solrindexer/spatial.py:163-199)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"ENVELOPE\(([-0-9.]+), ([-0-9.]+), ([-0-9.]+), ([-0-9.]+)\)"
    return F.struct(
        F.round(F.regexp_extract(c, pat, 1).cast("double"), 9).alias("west"),
        F.round(F.regexp_extract(c, pat, 2).cast("double"), 9).alias("east"),
        F.round(F.regexp_extract(c, pat, 3).cast("double"), 9).alias("north"),
        F.round(F.regexp_extract(c, pat, 4).cast("double"), 9).alias("south"))


def bbox_wkt_polygon(west, east, north, south) -> Column:
    """bbox → CCW WKT polygon; degenerate point → POINT; IDL-crossing
    (east < west) denormalized east+360
    (solrindexer/spatial.py:115-160, crossing at spatial.py:64-71)."""
    w, e, n, s = [F.col(c) if isinstance(c, str) else c
                  for c in (west, east, north, south)]
    e2 = F.when(e < w, e + 360.0).otherwise(e)
    point = F.format_string("POINT (%s %s)", w.cast("string"), s.cast("string"))
    poly = F.format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        w.cast("string"), s.cast("string"),
        e2.cast("string"), s.cast("string"),
        e2.cast("string"), n.cast("string"),
        w.cast("string"), n.cast("string"),
        w.cast("string"), s.cast("string"))
    return F.when((w == e) & (n == s), point).otherwise(poly)


def bbox_valid(west, east, north, south) -> Column:
    """Range asserts (solrindexer/spatial.py:96-103): lat in [-90,90],
    lon in [-180,180], south <= north."""
    w, e, n, s = [F.col(c) if isinstance(c, str) else c
                  for c in (west, east, north, south)]
    return ((s >= -90) & (n <= 90) & (s <= n) &
            (w >= -180) & (w <= 180) & (e >= -180) & (e <= 180))


def bbox_intersects(west, east, north, south,
                    qwest: float, qeast: float,
                    qnorth: float, qsouth: float) -> Column:
    """bbox-vs-bbox intersection predicate — the query-side pushdown on
    the four float columns (the engine's stand-in for Solr's
    RecursivePrefixTree filter). Min/max parquet stats prune row groups
    for free when the predicate reaches the scan."""
    w, e, n, s = [F.col(c) if isinstance(c, str) else c
                  for c in (west, east, north, south)]
    return (w <= qeast) & (e >= qwest) & (s <= qnorth) & (n >= qsouth)
