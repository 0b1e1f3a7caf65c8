"""Structured Streaming ≡ batch: the same transformation over the same
events must produce identical results through readStream as through a
batch read (the Structured Streaming contract, verified)."""

import pytest

from solr_indexer_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch):
    return (spark.readStream.schema(events_batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_DIR))


def _sorted_rows(df, keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_windowed_counts_stream_equals_batch(spark, events_batch, events_stream):
    batch = windowed_event_counts(events_batch)
    q = run_stream_to_memory(
        windowed_event_counts(events_stream, watermark="2 hours"),
        "win_counts", mode="complete")
    try:
        q.processAllAvailable()
        got = spark.table("win_counts")
        assert _sorted_rows(got, ["win_start", "event_type"]) == \
            _sorted_rows(batch, ["win_start", "event_type"])
    finally:
        q.stop()


def test_session_window_stream_equals_batch(spark, events_batch, events_stream):
    batch = session_window_agg(events_batch)
    q = run_stream_to_memory(
        session_window_agg(events_stream, watermark="2 hours"),
        "sess", mode="complete")
    try:
        q.processAllAvailable()
        got = spark.table("sess")
        keys = ["user_id", "session_start"]
        assert _sorted_rows(got, keys) == _sorted_rows(batch, keys)
    finally:
        q.stop()
