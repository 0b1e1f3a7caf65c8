"""Scalar-function golden tests — the reference's test style
(tests/test_tools.py, tests/test_spatial.py): exact expected values,
parametrized, including the IDL-crossing and degenerate-point spatial
cases."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.functions import scalars as S
from solr_indexer_spark.functions import spatial as G


def _one(spark, col, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
        if all(isinstance(v, str) or v is None for v in cols.values())
        else None)
    if df.schema[0].dataType.typeName() == "void":
        pytest.skip("schema inference failed")
    return df.select(col.alias("out")).collect()[0]["out"]


@pytest.mark.parametrize("raw,expected", [
    ("no.met:ADC/disk.file", "no-met-ADC-disk-file"),
    ("a:b/c.d", "a-b-c-d"),
    ("clean-id", "clean-id"),
])
def test_to_solr_id(spark, raw, expected):
    # reference golden: tests/test_tools.py:19-26 (to_solr_id)
    df = spark.createDataFrame([(raw,)], "s string")
    assert df.select(S.to_solr_id("s").alias("o")).collect()[0]["o"] == expected


@pytest.mark.parametrize("raw,expected", [
    ("2024-01-02T03:04:05Z", "2024-01-02T03:04:05Z"),
    ("2024-01-02T03:04:05+00:00", "2024-01-02T03:04:05Z"),
    ("2024-01-02 03:04:05", "2024-01-02T03:04:05Z"),
    ("2024-01-02", "2024-01-02T00:00:00Z"),
    ("not a date", None),
])
def test_parse_date(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "s string")
    assert df.select(S.parse_date("s").alias("o")).collect()[0]["o"] == expected


def test_check_date_format(spark):
    df = spark.createDataFrame(
        [("2024-01-02T03:04:05Z",), ("2024-1-2T3:4:5Z",)], "s string")
    got = [r["o"] for r in
           df.select(S.check_date_format("s").alias("o")).collect()]
    assert got == [True, False]


def test_date_range_roundtrip(spark):
    df = spark.createDataFrame(
        [("2020-01-01T00:00:00Z", "2021-01-01T00:00:00Z"),
         ("2020-01-01T00:00:00Z", None)], "s string, e string")
    ranges = [r["o"] for r in
              df.select(S.date_range_string("s", "e").alias("o")).collect()]
    assert ranges == ["[2020-01-01T00:00:00Z TO 2021-01-01T00:00:00Z]",
                      "[2020-01-01T00:00:00Z TO *]"]
    back = (spark.createDataFrame([(x,) for x in ranges], "r string")
            .select(S.parse_date_range("r").alias("o")).collect())
    assert back[0]["o"]["start"] == "2020-01-01T00:00:00Z"
    assert back[0]["o"]["end"] == "2021-01-01T00:00:00Z"
    assert back[1]["o"]["end"] is None


def test_doi_extract(spark):
    df = spark.createDataFrame(
        [("see https://doi.org/10.21343/cs55-ac46 for data",),
         ("no doi here",)], "s string")
    got = [r["o"] for r in df.select(S.extract_doi("s").alias("o")).collect()]
    assert got[0] == "10.21343/cs55-ac46"
    assert got[1] is None


def test_multivalued_merge_and_sorted_set(spark):
    df = spark.createDataFrame([(["b", "a", ""], ["a", "c", None])],
                               "x array<string>, y array<string>")
    merged = df.select(S.append_multivalued("x", "y").alias("o")).collect()[0]["o"]
    assert merged == ["b", "a", "c"]          # first-seen order, no empties
    ss = df.select(S.sorted_set("x").alias("o")).collect()[0]["o"]
    assert ss == ["", "a", "b"]


def test_multilang_pick(spark):
    df = spark.createDataFrame(
        [([("en", "hello"), ("no", "hei")],)],
        "p array<struct<lang string, value string>>")
    en = df.select(S.multilang_pick("p", "en").alias("o")).collect()[0]["o"]
    no = df.select(S.multilang_pick("p", "no").alias("o")).collect()[0]["o"]
    assert (en, no) == ("hello", "hei")


def test_temporal_range_valid(spark):
    df = spark.createDataFrame(
        [("2020-01-01", "2021-01-01"), ("2021-01-01", "2020-01-01"),
         ("2020-01-01", None)], "s string, e string")
    got = [r["o"] for r in df.select(
        S.temporal_range_valid(F.col("s").cast("date"),
                               F.col("e").cast("date")).alias("o")).collect()]
    assert got == [True, False, True]


def test_nested_minmax_and_chronological_sort(spark):
    # P11/T2: earliest/latest over a nested update-history array and
    # chronological sort (solrindexer/mmd.py:356-393)
    df = spark.createDataFrame(
        [([("2021-05-01T00:00:00Z", "minor"),
           ("2019-01-01T00:00:00Z", "created"),
           ("2020-07-01T00:00:00Z", "major")],)],
        "updates array<struct<dt string, typ string>>")
    out = df.select(
        F.array_min("updates")["dt"].alias("created"),
        F.array_max("updates")["dt"].alias("updated"),
        F.sort_array("updates").alias("chrono")).collect()[0]
    assert out["created"] == "2019-01-01T00:00:00Z"
    assert out["updated"] == "2021-05-01T00:00:00Z"
    assert [u["typ"] for u in out["chrono"]] == ["created", "major", "minor"]


# --- spatial goldens (reference tests/test_spatial.py style) -----------

def test_envelope_roundtrip(spark):
    df = spark.createDataFrame([(-10.0, 20.0, 80.0, 60.0)],
                               "w double, e double, n double, s double")
    env = df.select(G.envelope_string("w", "e", "n", "s").alias("o")) \
        .collect()[0]["o"]
    assert env == "ENVELOPE(-10.0, 20.0, 80.0, 60.0)"
    back = (spark.createDataFrame([(env,)], "v string")
            .select(G.parse_envelope("v").alias("o")).collect()[0]["o"])
    assert (back["west"], back["east"], back["north"], back["south"]) == \
        (-10.0, 20.0, 80.0, 60.0)


@pytest.mark.parametrize("w,e,n,s,frag", [
    (-10.0, 20.0, 80.0, 60.0, "POLYGON ((-10.0 60.0, 20.0 60.0"),
    (170.0, -170.0, 10.0, -10.0, "190.0"),       # IDL crossing: east+360
    (5.0, 5.0, 7.0, 7.0, "POINT (5.0 7.0)"),     # degenerate point
])
def test_bbox_wkt(spark, w, e, n, s, frag):
    df = spark.createDataFrame([(w, e, n, s)],
                               "w double, e double, n double, s double")
    wkt = df.select(G.bbox_wkt_polygon("w", "e", "n", "s").alias("o")) \
        .collect()[0]["o"]
    assert frag in wkt


def test_bbox_valid_and_intersects(spark):
    df = spark.createDataFrame(
        [(-10.0, 20.0, 80.0, 60.0), (-10.0, 20.0, 95.0, 60.0)],
        "w double, e double, n double, s double")
    valid = [r["o"] for r in
             df.select(G.bbox_valid("w", "e", "n", "s").alias("o")).collect()]
    assert valid == [True, False]
    hits = df.select(G.bbox_intersects("w", "e", "n", "s",
                                       0.0, 5.0, 70.0, 65.0).alias("o")) \
        .collect()
    assert hits[0]["o"] is True


def test_geometry_segmentize_centroid_geojson():
    """Pure-python shapely-free subset of solrindexer/spatial.py:202-267:
    segmentize vertex math, shoelace centroid, GeoJSON, repair seam."""
    import json
    import pytest as _pytest
    from solr_indexer_spark.functions.geometry import (
        is_axis_rect, parse_wkt, segmentize, validate_fix_geometry,
        wkt_centroid, wkt_rect_to_segmentized, to_geojson)

    rect = "POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0))"
    kind, coords = parse_wkt(rect)
    assert kind == "polygon" and is_axis_rect(coords)
    seg = segmentize(coords, 3.0)
    # edges 10,4,10,4 -> ceil(10/3)=4, ceil(4/3)=2 pieces: 4+2+4+2 new pts
    assert len(seg) == 1 + 4 + 2 + 4 + 2
    # every segment <= 3 + eps
    import math
    for (x0, y0), (x1, y1) in zip(seg, seg[1:]):
        assert math.hypot(x1 - x0, y1 - y0) <= 3.0 + 1e-9
    assert seg[0] == seg[-1] == (0.0, 0.0)

    out = wkt_rect_to_segmentized(rect)
    assert out.startswith("POLYGON ((0 0, 2.5 0")
    gj = json.loads(wkt_rect_to_segmentized(rect, output="GeoJSON"))
    assert gj["type"] == "Polygon" and len(gj["coordinates"][0]) == 13

    # non-rect polygon passes through un-segmentized
    tri = "POLYGON ((0 0, 10 0, 5 8, 0 0))"
    assert wkt_rect_to_segmentized(tri) == "POLYGON ((0 0, 10 0, 5 8, 0 0))"
    # linestring always segmentizes
    ln = wkt_rect_to_segmentized("LINESTRING (0 0, 9 0)")
    assert ln == "LINESTRING (0 0, 3 0, 6 0, 9 0)"

    assert wkt_centroid(rect) == "POINT (5 2)"
    assert wkt_centroid("POINT (3 4)") == "POINT (3 4)"
    assert wkt_centroid("LINESTRING (0 0, 4 0)") == "POINT (2 0)"

    assert to_geojson("point", [(1.5, -2.0)]) == \
        '{"type":"Point","coordinates":[1.5,-2.0]}'

    # valid geometry passes through the repair seam cleanly; a bowtie
    # (one crossing, opposite-winding lobes) is repaired the way GEOS
    # buffer(0) repairs it — the CCW lobe survives (VERDICT r3 #8)
    assert validate_fix_geometry(rect) == \
        ("POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0))", None)
    bow = "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))"
    assert validate_fix_geometry(bow) == \
        ("POLYGON ((5 5, 0 10, 0 0, 5 5))", None)
    # harder invalidity (self-intersecting shell + a hole): still the
    # reference's repair-failed path — original WKT + problem message
    # for the ledger (never an exception)
    hard = "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0), " \
           "(1 1, 2 1, 2 2, 1 1))"
    fixed, problem = validate_fix_geometry(hard)
    assert fixed == hard and "Self-intersection" in problem


def test_bowtie_repair_matches_geos_golden():
    """VERDICT r3 #8 golden: GEOS buffer(0) on the canonical bowtie
    ``Polygon([(0,0),(2,2),(2,0),(0,2)])`` returns
    ``POLYGON ((0 0, 1 1, 0 2, 0 0))`` — the positive-winding lobe,
    split at the crossing. Our repair returns the SAME ring (identical
    cyclic vertex order and orientation); only the serialization
    starting point differs (we start at the crossing)."""
    from solr_indexer_spark.functions.geometry import (parse_wkt_any,
                                                       validate_fix_geometry)
    fixed, problem = validate_fix_geometry(
        "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert problem is None
    assert fixed == "POLYGON ((1 1, 0 2, 0 0, 1 1))"
    ours = parse_wkt_any(fixed)[1][0][:-1]
    geos = parse_wkt_any("POLYGON ((0 0, 1 1, 0 2, 0 0))")[1][0][:-1]
    k = geos.index(ours[0])
    assert ours == geos[k:] + geos[:k]
    # same-winding double loop (buffer(0) would UNION, not split):
    # refused — harder-case pass-through
    from solr_indexer_spark.functions.geometry import repair_bowtie_ring
    assert repair_bowtie_ring(
        [(0, 0), (4, 0), (4, 4), (1, 4), (1, 1), (3, 1), (3, 3),
         (0, 3), (0, 0)]) is None


def test_multicross_repair_matches_geos_winding_rule():
    """VERDICT r4 #6 goldens: ≥2-crossing hole-free shells repaired by
    full noding + the GEOS buffer(0) winding rule."""
    from solr_indexer_spark.functions.geometry import (
        repair_multicross_ring, validate_fix_geometry)
    # double-dip: (0 0, 3 0, 3 1, 2 1, 2 -1, 1 -1, 1 1, 0 1, 0 0) —
    # two crossings at (2,0) and (1,0). buffer(0) keeps the two CCW
    # unit squares and DROPS the CW middle dip (the classic
    # buffer(0)-vs-make_valid difference, GEOS/Shapely docs)
    fixed, problem = validate_fix_geometry(
        "POLYGON ((0 0, 3 0, 3 1, 2 1, 2 -1, 1 -1, 1 1, 0 1, 0 0))")
    assert problem is None
    assert fixed == ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                     "((2 0, 3 0, 3 1, 2 1, 2 0)))")
    # triple-crossing comb: three CCW teeth survive, two CW dips drop
    comb = [(0, 0), (5, 0), (5, 1), (4, 1), (4, -1), (3, -1), (3, 1),
            (2, 1), (2, -1), (1, -1), (1, 1), (0, 1), (0, 0)]
    polys = repair_multicross_ring(comb)
    assert polys is not None and len(polys) == 3
    assert [min(p[0]) for p in polys] == [(0, 0), (2, 0), (4, 0)]
    # zero-area sliver (collinear spike through a crossing) → ledger
    assert repair_multicross_ring(
        [(0, 0), (4, 0), (2, 0), (2, 2), (0, 2), (0, 0)]) is None


def test_winding_rule_union_hole_and_pinch_classes():
    """VERDICT r5 #4 goldens — the full w ≥ 1 winding semantics.

    Nested positive lobes (the 'curl': one proper crossing, inner lobe
    winding SAME as shell — forced: a single proper crossing can only
    nest same-sign loops) → buffer(0) UNION = the outer boundary alone.
    A pinched CW pocket (self-touching shell, repeated vertex) →
    buffer(0) carves an interior ring touching the shell at the pinch
    (w=0 face strictly surrounded by w=1). The classic banana pinch
    (two positive lobes sharing the pinch vertex) → MULTIPOLYGON of
    the lobes. All three are GEOS buffer(0)'s winding-number-≥1
    region; JTS BufferOp/shapely references in the module docstring."""
    from solr_indexer_spark.functions.geometry import (
        repair_multicross_ring, validate_fix_geometry)
    # union: the kept outline is the pentagon through the crossing node
    fixed, problem = validate_fix_geometry(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 6 4, 6 7, 4 7, 0 0))")
    assert problem is None
    assert fixed == ("POLYGON ((0 0, 10 0, 10 10, 0 10, "
                     "3.636363636 6.363636364, 0 0))")
    # hole carving: CW pocket off the pinch vertex → interior ring
    fixed, problem = validate_fix_geometry(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 3 6, 6 6, 6 3, 3 3, 3 6, "
        "0 0))")
    assert problem is None
    assert fixed == ("POLYGON ((0 0, 10 0, 10 10, 0 10, 3 6, 0 0), "
                     "(3 6, 6 6, 6 3, 3 3, 3 6))")
    # pinch banana: two positive lobes → MULTIPOLYGON
    fixed, problem = validate_fix_geometry(
        "POLYGON ((0 0, 2 0, 1 1, 2 2, 0 2, 1 1, 0 0))")
    assert problem is None
    assert fixed == ("MULTIPOLYGON (((0 0, 2 0, 1 1, 0 0)), "
                     "((1 1, 2 2, 0 2, 1 1)))")
    # pocket inside DOUBLY-covered region: pocket w_in = 1 → stays
    # covered, dropped; kept outline is the outer union boundary.
    # (curl shell + its nested lobe + a pinched CW pocket inside the
    # lobe is beyond the single-walk fixtures — covered by arithmetic:
    # see repair_multicross_ring docstring w-table)
    # simple ring stays untouched (no false positives from the touch
    # probe: closing vertex repetition is not a touch)
    assert repair_multicross_ring(
        [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]) is None


def test_geometry_multi_kinds():
    """MULTI* WKT (VERDICT r2 #5): parse/serialize round-trip,
    MultiLineString segmentizes (reference spatial.py:214-215),
    MultiPolygon/MultiPoint pass through, GEOS-compatible centroids,
    holes subtract."""
    import json
    from solr_indexer_spark.functions.geometry import (
        centroid_any, parse_wkt_any, to_geojson_any, to_wkt_any,
        wkt_centroid, wkt_rect_to_segmentized)

    mls = "MULTILINESTRING ((0 0, 9 0), (0 5, 0 8))"
    kind, data = parse_wkt_any(mls)
    assert kind == "multilinestring" and len(data) == 2
    assert to_wkt_any(kind, data) == mls
    # long edge splits, short edge untouched
    assert wkt_rect_to_segmentized(mls) == \
        "MULTILINESTRING ((0 0, 3 0, 6 0, 9 0), (0 5, 0 8))"

    mp = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 12 10, 12 12, 10 10)))"
    assert wkt_rect_to_segmentized(mp) == mp          # pass-through
    kind, data = parse_wkt_any(mp)
    assert kind == "multipolygon" and len(data) == 2
    gj = json.loads(to_geojson_any(kind, data))
    assert gj["type"] == "MultiPolygon" and len(gj["coordinates"]) == 2

    mpt = "MULTIPOINT ((1 2), (3 4))"
    assert wkt_rect_to_segmentized(mpt) == mpt
    assert wkt_centroid(mpt) == "POINT (2 3)"
    # bare-coordinates MULTIPOINT spelling parses too
    assert parse_wkt_any("MULTIPOINT (1 2, 3 4)")[1] == \
        [(1.0, 2.0), (3.0, 4.0)]

    # unknown kinds pass through wkt_rect_to_segmentized unchanged
    gc = "GEOMETRYCOLLECTION (POINT (1 1))"
    assert wkt_rect_to_segmentized(gc) == gc

    # polygon with a hole: centroid subtracts the hole area
    holed = ("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
             "(0 0, 4 0, 4 4, 0 4, 0 0))")
    kind, data = parse_wkt_any(holed)
    assert len(data) == 2
    cx, cy = centroid_any(kind, data)
    # 8x8 square at (4,4) minus 4x4 square at (2,2):
    # (64*4 - 16*2)/48, same for y
    import pytest
    assert cx == pytest.approx(14 / 3) and cy == pytest.approx(14 / 3)
    # multipolygon centroid is area-weighted over components
    kind, data = parse_wkt_any(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
        "((10 0, 14 0, 14 4, 10 4, 10 0)))")
    cx, cy = centroid_any(kind, data)
    assert (round(cx, 9), round(cy, 9)) == ((4 * 1 + 16 * 12) / 20, (4 * 1 + 16 * 2) / 20)


def test_geometry_ledger_routing(spark, tmp_path):
    """Invalid geometries log-and-continue (reference
    spatial.py:243-267): rows keep flowing, failures land in the
    run_log ledger with stage='geometry'."""
    from solr_indexer_spark.functions.geometry import route_invalid_geometries
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
         (2, "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0), "
             "(1 1, 2 1, 2 2, 1 1))"),
         (3, "NOT A GEOMETRY"),
         (4, "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")],
        "doc_id long, wkt string")
    ledger = str(tmp_path / "run_log")
    out = route_invalid_geometries(df, "wkt", "doc_id", ledger_dir=ledger)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4                      # every row kept flowing
    assert rows[1]["geom_problem"] is None
    assert "Self-intersection" in rows[2]["geom_problem"]
    assert "unparseable" in rows[3]["geom_problem"]
    # harder case (shell crossing + hole): original unchanged
    assert rows[2]["wkt"].startswith("POLYGON ((0 0, 10 10,")
    # plain bowtie: REPAIRED in place (r4), no ledger entry
    assert rows[4]["geom_problem"] is None
    assert rows[4]["wkt"] == "POLYGON ((5 5, 0 10, 0 0, 5 5))"
    led = spark.read.parquet(ledger)
    assert led.filter("stage = 'geometry'").count() == 2


def test_gml_axis_order_edge_cases():
    """ADVICE r2: srsName matching is exact-code (no '4326' substring
    false positives) and GML 2.x <coordinates> never swaps."""
    from solr_indexer_spark.functions.geometry import parse_gml_polygon
    # EPSG:43260 must NOT trigger the lat-lon swap
    gml = ('<gml:Polygon xmlns:gml="http://www.opengis.net/gml" '
           'srsName="EPSG:43260"><gml:exterior>'
           '<gml:LinearRing><gml:posList>10 60 12 60 12 62 10 60'
           '</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>')
    assert parse_gml_polygon(gml) == \
        "POLYGON ((10 60, 12 60, 12 62, 10 60))"
    # uri form of 4326 DOES trigger it
    gml2 = ('<gml:Polygon xmlns:gml="http://www.opengis.net/gml" '
            'srsName="http://www.opengis.net/def/crs/EPSG/0/4326">'
            '<gml:exterior><gml:LinearRing><gml:posList>'
            '60 10 60 12 62 12 60 10'
            '</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>')
    assert parse_gml_polygon(gml2) == \
        "POLYGON ((10 60, 12 60, 12 62, 10 60))"
    # GML 2.x coordinates stay x,y even under a 4326 srsName
    gml3 = ('<gml:Polygon xmlns:gml="http://www.opengis.net/gml" '
            'srsName="urn:ogc:def:crs:EPSG::4326">'
            '<gml:outerBoundaryIs><gml:LinearRing>'
            '<gml:coordinates>10,60 12,60 12,62 10,62</gml:coordinates>'
            '</gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>')
    assert parse_gml_polygon(gml3) == \
        "POLYGON ((10 60, 12 60, 12 62, 10 62, 10 60))"


def test_geometry_udfs(spark):
    from pyspark.sql import functions as F
    from solr_indexer_spark.functions.geometry import (
        wkt_centroid_udf, wkt_segmentize_udf, wkt_to_geojson_udf)
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0))",), ("POINT (1 2)",)],
        "wkt string")
    rows = df.select(
        wkt_segmentize_udf("wkt").alias("seg"),
        wkt_centroid_udf("wkt").alias("c"),
        wkt_to_geojson_udf("wkt").alias("gj")).collect()
    assert rows[0]["c"] == "POINT (5 2)"
    assert rows[1]["gj"] == '{"type":"Point","coordinates":[1.0,2.0]}'
    assert "2.5 0" in rows[0]["seg"]


def test_gml_to_wkt():
    from solr_indexer_spark.functions.geometry import parse_gml_polygon
    gml = ('<gml:Polygon xmlns:gml="http://www.opengis.net/gml" '
           'srsName="urn:ogc:def:crs:EPSG::4326"><gml:exterior>'
           '<gml:LinearRing><gml:posList>60 10 60 12 62 12 62 10 60 10'
           '</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon>')
    # EPSG:4326 is lat-lon in GML -> swapped to lon-lat WKT
    assert parse_gml_polygon(gml) == \
        "POLYGON ((10 60, 12 60, 12 62, 10 62, 10 60))"
    gml2 = ('<gml:Polygon xmlns:gml="http://www.opengis.net/gml">'
            '<gml:outerBoundaryIs><gml:LinearRing>'
            '<gml:coordinates>10,60 12,60 12,62 10,62</gml:coordinates>'
            '</gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>')
    # GML2 coordinates are x,y (lon-lat); unclosed ring gets closed
    assert parse_gml_polygon(gml2) == \
        "POLYGON ((10 60, 12 60, 12 62, 10 62, 10 60))"


def test_wkt_any_roundtrip_property():
    """Property-fuzzed WKT round-trip: serialize(parse(x)) is a fixed
    point for every kind the general layer supports (point/linestring/
    polygon+holes and the MULTI* family)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from solr_indexer_spark.functions.geometry import (
        parse_wkt_any, to_wkt_any)

    coord = st.integers(min_value=-179, max_value=179)
    pt = st.tuples(coord, coord)

    def ring():
        return st.lists(pt, min_size=3, max_size=6).map(
            lambda ps: ps + [ps[0]])

    def wkt_strategy():
        return st.one_of(
            pt.map(lambda p: f"POINT ({p[0]} {p[1]})"),
            st.lists(pt, min_size=2, max_size=6).map(
                lambda ps: "LINESTRING (" + ", ".join(
                    f"{x} {y}" for x, y in ps) + ")"),
            st.lists(ring(), min_size=1, max_size=3).map(
                lambda rs: "POLYGON (" + ", ".join(
                    "(" + ", ".join(f"{x} {y}" for x, y in r) + ")"
                    for r in rs) + ")"),
            st.lists(pt, min_size=1, max_size=4).map(
                lambda ps: "MULTIPOINT (" + ", ".join(
                    f"({x} {y})" for x, y in ps) + ")"),
            st.lists(st.lists(pt, min_size=2, max_size=4),
                     min_size=1, max_size=3).map(
                lambda ls: "MULTILINESTRING (" + ", ".join(
                    "(" + ", ".join(f"{x} {y}" for x, y in l) + ")"
                    for l in ls) + ")"),
            st.lists(st.lists(ring(), min_size=1, max_size=2),
                     min_size=1, max_size=2).map(
                lambda polys: "MULTIPOLYGON (" + ", ".join(
                    "(" + ", ".join(
                        "(" + ", ".join(f"{x} {y}" for x, y in r) + ")"
                        for r in p) + ")" for p in polys) + ")"),
        )

    @given(wkt_strategy().flatmap(lambda s: st.just(s)))
    @settings(max_examples=200, deadline=None)
    def check(w):
        kind, data = parse_wkt_any(w)
        out = to_wkt_any(kind, data)
        assert out == w
        # idempotent: parse(serialize(parse(x))) == parse(x)
        assert parse_wkt_any(out) == (kind, data)

    check()
