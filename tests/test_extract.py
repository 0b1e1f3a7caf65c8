"""Extraction invariant + validation gates + ledger semantics.

Mirrors the reference's golden-fixture philosophy
(tests/test_mmd.py) and its negative fixtures (tests/input-files/fail/)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages, synth_pages_pdf
from solr_indexer_spark.extract import (
    exit_code,
    extract_pages,
    extract_text_py,
    failure_analytics,
    latest_wins,
    validate,
)


def test_extract_text_golden():
    html = b"<html><head><title>t</title><script>var x=1;</script></head><body><p>Hello &amp; goodbye</p></body></html>"
    assert extract_text_py(html) == "t Hello & goodbye"
    assert extract_text_py(None) is None
    assert extract_text_py(b"\xff\xfe\x00broken") is None
    assert extract_text_py(b"<html></html>") == ""


def test_extraction_byte_identity(spark):
    """extract(html) must reproduce the generator's text column exactly,
    per url — the input_hint per-row invariant."""
    pages = synth_pages(spark, n_docs=200)
    ext = extract_pages(pages.drop("text").withColumnRenamed("html", "html"))
    joined = (ext.select("url", "warc_ts", F.col("text").alias("extracted"))
              .join(pages.select("url", "warc_ts", "text"), ["url", "warc_ts"]))
    bad = joined.filter(
        F.col("text").isNotNull() & (F.col("extracted") != F.col("text")))
    assert bad.count() == 0


def test_latest_wins(spark):
    pages = extract_pages(synth_pages(spark, n_docs=50))
    deduped = latest_wins(pages)
    assert deduped.groupBy("url").count().filter("count > 1").count() == 0
    # doc zero has a fresher revision in the fixture
    row = deduped.filter(
        F.col("url") == "https://example.org/crawl/00000000.html").collect()[0]
    assert row["text"] == "fresher revision of doc zero"


def test_validation_split_and_exit_code(spark):
    pages = extract_pages(synth_pages(spark, n_docs=50))
    good, run_log = validate(latest_wins(pages))
    log = {(r["stage"], r["severity"]): r["n_records"]
           for r in failure_analytics(run_log).collect()}
    # degenerate fixtures: empty text -> validation failure,
    # bad bytes -> parsing failure, null lang -> validation warning
    assert log[("validation", "failure")] == 1
    assert log[("parsing", "failure")] == 1
    assert log[("validation", "warning")] >= 1
    good_urls = {r["url"] for r in good.select("url").collect()}
    assert "https://example.org/degenerate/empty.html" not in good_urls
    assert "https://example.org/degenerate/badbytes.html" not in good_urls
    assert "https://example.org/degenerate/nulllang.html" in good_urls
    assert exit_code(run_log) == 1
    assert exit_code(run_log.filter("severity = 'warning'")) == 3
    assert exit_code(run_log.filter("severity = 'nope'")) == 0


def test_generator_deterministic():
    a = synth_pages_pdf(n_docs=100, seed=7)
    b = synth_pages_pdf(n_docs=100, seed=7)
    assert a.equals(b)


def test_latest_wins_full_tiebreak_deterministic(spark):
    """ADVICE r1: equal (url, warc_ts, text) but different html/lang
    must pick the SAME winner for the non-text columns every run —
    tie-break chain is sha, then html length desc, then lang asc."""
    from solr_indexer_spark.extract import extract_pages, latest_wins
    rows = [
        ("u1", "2024-01-01T00:00:00", b"<p>same text</p>", "en"),
        ("u1", "2024-01-01T00:00:00", b"<p>same   text</p>", "de"),
        ("u1", "2024-01-01T00:00:00", b"<p>same  text</p>", "fr"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string, html binary, lang string")
    outs = set()
    for _ in range(3):
        r = latest_wins(extract_pages(pages)).select("url", "lang", "html").collect()
        assert len(r) == 1
        outs.add((r[0]["lang"], r[0]["html"]))
    assert len(outs) == 1
    # longest html wins ("<p>same   text</p>" = 18 chars... compute):
    lens = {(row[3], len(row[2])) for row in rows}
    max_len = max(l for _, l in lens)
    assert len(outs.pop()[1]) == max_len


def test_schema_validate_compiled_cache_and_rules(spark):
    """XSD-analogue schema validation (mmd.py:238-271): per-process
    compiled-schema cache (mmd.py:51-94 pattern) + vectorized rules."""
    from solr_indexer_spark.schema_validate import (
        canonical_spec, compile_count, compile_schema, validate_schema)
    spec = {"required": ["text"], "vocab": {"lang": ["en", "de"]},
            "max_len": {"source": 4}, "types": {"n_chars": "int"}}
    rows = [
        (1, "good text", "en", "src1", 10),
        (2, None, "en", "src1", 10),          # required failure
        (3, "  ", "de", "src1", 10),          # required failure (blank)
        (4, "ok", "zh", "verylongsrc", 10),   # two warnings
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    out = {r["doc_id"]: r for r in validate_schema(
        df, spec, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).collect()}
    assert out[1]["schema_ok"] and out[1]["schema_errors"] == []
    assert not out[2]["schema_ok"]
    assert "failure:text:required" in out[2]["schema_errors"]
    assert not out[3]["schema_ok"]
    assert out[4]["schema_ok"]            # warnings keep the row ok
    assert sorted(out[4]["schema_errors"]) == [
        "warning:lang:vocab", "warning:source:max_len:4"]

    # compiled-schema cache: same spec compiles once per process
    sj = canonical_spec(spec)
    before = compile_count()
    compile_schema(sj)
    compile_schema(sj)
    after = compile_count()
    assert after <= before + 1


def test_schema_validate_split_fail_fast(spark):
    """VERDICT r2 #6: fail-fast mode rejects fatal rows and routes
    every violation into an extract.validate-compatible run_log
    (enforcement-then-ledger, reference indexer.py:253-285)."""
    from solr_indexer_spark.extract import exit_code, failure_analytics
    from solr_indexer_spark.schema_validate import validate_schema_split
    spec = {"required": ["text"], "vocab": {"lang": ["en", "de"]},
            "max_len": {"source": 4}, "types": {"n_chars": "int"}}
    rows = [
        (1, "good text", "en", "src1", 10),
        (2, None, "en", "src1", 10),          # fatal
        (3, "  ", "de", "src1", 10),          # fatal
        (4, "ok", "zh", "verylongsrc", 10),   # warnings only -> kept
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    good, run_log = validate_schema_split(
        df, spec, id_col="doc_id",
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    assert {r["doc_id"] for r in good.collect()} == {1, 4}
    led = run_log.collect()
    assert all(r["stage"] == "schema" for r in led)
    fatals = {r["url"] for r in led if r["severity"] == "failure"}
    assert fatals == {"2", "3"}
    warns = sorted((r["url"], r["message"])
                   for r in led if r["severity"] == "warning")
    assert warns == [("4", "lang:vocab"), ("4", "source:max_len:4")]
    # composes with the extract-side ledger machinery
    fa = {(r["stage"], r["severity"]): r["n_records"]
          for r in failure_analytics(
              run_log.withColumnRenamed("url", "url")).collect()}
    assert fa[("schema", "failure")] == 2 and fa[("schema", "warning")] == 2
    assert exit_code(run_log) == 1
