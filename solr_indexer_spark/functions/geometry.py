"""Pure-python geometry scalars — the shapely-free subset of the
reference's spatial module (solrindexer/spatial.py:202-267):

  * WKT POLYGON/POINT/LINESTRING parse + serialize
  * rectangle detection (wkt_rect_to_segmetized_geom's gate:
    minimum_rotated_rectangle.area ≈ area — here the axis-aligned
    check, which is the case the reference actually feeds it: bbox
    rectangles from MMD metadata)
  * segmentize — shapely's Geometry.segmentize is LINEAR interpolation
    in coordinate space: split every edge longer than max_len into
    equal parts; identical vertex math here
  * WKT → GeoJSON (to_geojson analogue, compact separators)
  * polygon centroid (shoelace) / point+linestring centroids
  * validate_fix_geometry — the buffer(0) repair needs a robust
    geometry kernel (GEOS); DELIBERATE STUB (the documented shapely
    seam, same policy as the multimodal decoder stub)

Spark surface: Arrow-batched pandas UDFs over these pure functions —
geometry strings in, geometry strings out, no per-row Python in JVM
paths that can avoid it (the bbox fast paths in spatial.py stay pure
Catalyst).
"""

from __future__ import annotations

import json
import math
import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_POLY_RE = re.compile(r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$",
                      re.IGNORECASE | re.DOTALL)
_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*(\S+)\s+(\S+)\s*\)\s*$",
                       re.IGNORECASE)
_LINE_RE = re.compile(r"^\s*LINESTRING\s*\(\s*(.*?)\s*\)\s*$",
                      re.IGNORECASE | re.DOTALL)


def _parse_coords(body: str) -> list:
    out = []
    for pair in body.split(","):
        x, y = pair.split()
        out.append((float(x), float(y)))
    return out


def parse_wkt(wkt: str):
    """→ (kind, coords) with kind in {point, linestring, polygon};
    raises ValueError on anything else (the reference lets shapely
    raise the same way)."""
    m = _POINT_RE.match(wkt)
    if m:
        return "point", [(float(m.group(1)), float(m.group(2)))]
    m = _LINE_RE.match(wkt)
    if m:
        return "linestring", _parse_coords(m.group(1))
    m = _POLY_RE.match(wkt)
    if m:
        return "polygon", _parse_coords(m.group(1))
    raise ValueError(f"unsupported WKT: {wkt[:40]!r}")


def _fmt(v: float) -> str:
    return f"{v:.10g}"


def to_wkt(kind: str, coords: list) -> str:
    pts = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in coords)
    if kind == "point":
        (x, y), = coords
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if kind == "linestring":
        return f"LINESTRING ({pts})"
    return f"POLYGON (({pts}))"


def to_geojson(kind: str, coords: list) -> str:
    """Compact GeoJSON — shapely.to_geojson analogue."""
    if kind == "point":
        geom = {"type": "Point", "coordinates": list(coords[0])}
    elif kind == "linestring":
        geom = {"type": "LineString",
                "coordinates": [list(c) for c in coords]}
    else:
        geom = {"type": "Polygon",
                "coordinates": [[list(c) for c in coords]]}
    return json.dumps(geom, separators=(",", ":"))


def is_axis_rect(coords: list) -> bool:
    """Closed 5-point axis-aligned rectangle ring — the shape the
    reference's min-rotated-rectangle-area gate passes for bbox
    polygons."""
    if len(coords) != 5 or coords[0] != coords[-1]:
        return False
    xs = sorted({c[0] for c in coords})
    ys = sorted({c[1] for c in coords})
    return len(xs) == 2 and len(ys) == 2


def segmentize(coords: list, max_len: float) -> list:
    """Shapely-identical segmentize: each edge longer than ``max_len``
    is split into ceil(len/max_len) equal linear pieces."""
    out = [coords[0]]
    for (x0, y0), (x1, y1) in zip(coords, coords[1:]):
        d = math.hypot(x1 - x0, y1 - y0)
        n = max(1, math.ceil(d / max_len - 1e-12))
        for i in range(1, n + 1):
            out.append((x0 + (x1 - x0) * i / n, y0 + (y1 - y0) * i / n))
    return out


def centroid(kind: str, coords: list) -> tuple:
    """Shapely-compatible centroid: area centroid (shoelace) for
    polygons, length-weighted midpoint for linestrings, the point
    itself for points."""
    if kind == "point":
        return coords[0]
    if kind == "linestring":
        tot, cx, cy = 0.0, 0.0, 0.0
        for (x0, y0), (x1, y1) in zip(coords, coords[1:]):
            d = math.hypot(x1 - x0, y1 - y0)
            tot += d
            cx += d * (x0 + x1) / 2
            cy += d * (y0 + y1) / 2
        if tot == 0:
            return coords[0]
        return cx / tot, cy / tot
    a, cx, cy = 0.0, 0.0, 0.0
    for (x0, y0), (x1, y1) in zip(coords, coords[1:]):
        cross = x0 * y1 - x1 * y0
        a += cross
        cx += (x0 + x1) * cross
        cy += (y0 + y1) * cross
    if a == 0:
        return coords[0]
    return cx / (3 * a), cy / (3 * a)


def wkt_rect_to_segmentized(wkt: str, segments: float = 3,
                            output: str = "WKT") -> str:
    """solrindexer/spatial.py:202-227 wkt_rect_to_segmetized_geom:
    rectangles and linestrings are segmentized for accurate
    reprojection; everything else passes through unchanged."""
    kind, coords = parse_wkt(wkt)
    do_seg = (kind == "linestring"
              or (kind == "polygon" and is_axis_rect(coords)))
    if do_seg:
        coords = segmentize(coords, segments)
    if output == "GeoJSON":
        return to_geojson(kind, coords)
    return to_wkt(kind, coords)


def wkt_centroid(wkt: str) -> str:
    """solrindexer/spatial.py:237-241 get_center_from."""
    kind, coords = parse_wkt(wkt)
    x, y = centroid(kind, coords)
    return f"POINT ({_fmt(x)} {_fmt(y)})"


def validate_fix_geometry(wkt: str) -> str:
    """solrindexer/spatial.py:243-267 buffer(0)+simplify repair.
    DELIBERATE STUB: robust self-intersection repair requires a GEOS
    kernel (shapely), absent from this container — the Spark-side
    plumbing (UDF signature, pass-through of already-valid geometry)
    is real; the repair raises so nobody mistakes it for implemented."""
    kind, coords = parse_wkt(wkt)          # parse = the validity probe
    if kind == "polygon" and _ring_self_intersects(coords):
        raise NotImplementedError(
            "buffer(0) repair needs a GEOS kernel (shapely) — "
            "documented seam, see module docstring")
    return to_wkt(kind, coords)


def _seg_intersect(p1, p2, p3, p4) -> bool:
    def ccw(a, b, c):
        return (c[1] - a[1]) * (b[0] - a[0]) > (b[1] - a[1]) * (c[0] - a[0])
    return (ccw(p1, p3, p4) != ccw(p2, p3, p4)
            and ccw(p1, p2, p3) != ccw(p1, p2, p4))


def _ring_self_intersects(coords: list) -> bool:
    edges = list(zip(coords, coords[1:]))
    for i, (a, b) in enumerate(edges):
        for c, d in edges[i + 2:]:
            if (a, b) == edges[0] and (c, d) == edges[-1]:
                continue                      # closing edge adjacency
            if _seg_intersect(a, b, c, d):
                return True
    return False


# ---- Arrow-batched Spark surface ------------------------------------------

@pandas_udf(T.StringType())
def wkt_segmentize_udf(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda w: wkt_rect_to_segmentized(w) if w else None)


@pandas_udf(T.StringType())
def wkt_to_geojson_udf(wkt: pd.Series) -> pd.Series:
    def conv(w):
        if not w:
            return None
        kind, coords = parse_wkt(w)
        return to_geojson(kind, coords)
    return wkt.map(conv)


@pandas_udf(T.StringType())
def wkt_centroid_udf(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda w: wkt_centroid(w) if w else None)


# ---- GML → WKT (solrindexer/spatial.py:80-84 parse_gml_to_wkt) ------------

import xml.etree.ElementTree as _ET

_GML_NS = "{http://www.opengis.net/gml}"
_GML32_NS = "{http://www.opengis.net/gml/3.2}"


def parse_gml_polygon(gml_xml: str, srs: str | None = None) -> str:
    """Minimal pygml-free GML Polygon/LinearRing parser → WKT.

    Handles gml:Polygon (3.x ``posList`` and 2.x ``coordinates``) in
    both gml and gml/3.2 namespaces. Axis order follows the srsName:
    EPSG:4326 (and the bare 'EPSG:4326' / urn forms) is LAT LON in GML
    — coordinates are swapped to WKT's lon-lat; CRS84 and absent srs
    are already lon-lat (the same convention pygml applies)."""
    root = _ET.fromstring(gml_xml)
    srs = srs or root.attrib.get("srsName") or ""
    lat_first = "4326" in srs

    def findall(tag):
        return (root.findall(f".//{_GML_NS}{tag}")
                or root.findall(f".//{_GML32_NS}{tag}"))

    pos_lists = findall("posList")
    if pos_lists:
        nums = [float(v) for v in pos_lists[0].text.split()]
        pairs = list(zip(nums[0::2], nums[1::2]))
    else:
        coords = findall("coordinates")
        if not coords:
            raise ValueError("no gml:posList / gml:coordinates found")
        pairs = [tuple(float(v) for v in p.split(","))
                 for p in coords[0].text.split()]
    if lat_first:
        pairs = [(x, y) for y, x in pairs]
    if pairs[0] != pairs[-1]:
        pairs.append(pairs[0])
    return to_wkt("polygon", pairs)


@pandas_udf(T.StringType())
def gml_to_wkt_udf(gml: pd.Series) -> pd.Series:
    return gml.map(lambda g: parse_gml_polygon(g) if g else None)
