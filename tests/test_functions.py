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
