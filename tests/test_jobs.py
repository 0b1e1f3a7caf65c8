"""Job entry points driven in-process: the same main() functions
spark-submit runs (verified manually via spark-submit --py-files; this
keeps the wiring under regression)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

import build_index_job  # noqa: E402
import query_job  # noqa: E402

from solr_indexer_spark.corpus import synth_pages  # noqa: E402


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    synth_pages(spark, n_docs=300).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_build_then_query_jobs(spark, pages_dir, tmp_path):
    out = str(tmp_path / "idx")
    code = build_index_job.main([
        "--input", pages_dir, "--output", out,
        "--shard-range", "128", "--group-size", "4", "--run-id", "t"])
    # degenerate fixture rows produce validation failures -> exit 1
    # (the reference's exit-code contract, solrindexer/cli.py:270-276)
    assert code == 1
    for artifact in ("_manifest.jsonl", "blocks", "corpus_stats",
                     "run_log", "doc_map"):
        assert os.path.exists(os.path.join(out, artifact))

    hits_dir = str(tmp_path / "hits")
    code = query_job.main([
        "--index", out, "--query", "term0000 term0101",
        "--query", "uniq00000047", "--k", "5", "--output", hits_dir])
    assert code == 0
    hits = spark.read.parquet(hits_dir)
    rows = hits.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    assert "url" in hits.columns           # doc_map joined back
    assert all(r["rank"] >= 1 for r in rows)

    # resume no-op: re-running skips every shard
    code = build_index_job.main([
        "--input", pages_dir, "--output", out,
        "--shard-range", "128", "--group-size", "4", "--run-id", "t2"])
    assert code == 1


def test_query_job_cursor_paging(spark, pages_dir, tmp_path, capsys):
    """The CLI cursor contract: --cursor '*' prints nextCursorMark;
    feeding it back serves the following page, identical to --start."""
    out = str(tmp_path / "idx_cur")
    build_index_job.main([
        "--input", pages_dir, "--output", out,
        "--shard-range", "128", "--group-size", "4", "--run-id", "c"])

    p1 = str(tmp_path / "p1")
    code = query_job.main([
        "--index", out, "--query", "term0000 term0101", "--k", "5",
        "--cursor", "*", "--output", p1])
    assert code == 0
    marks = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("nextCursorMark[")]
    assert len(marks) == 1
    mark = marks[0].split("=", 1)[1]

    p2 = str(tmp_path / "p2")
    code = query_job.main([
        "--index", out, "--query", "term0000 term0101", "--k", "5",
        "--cursor", mark, "--output", p2])
    assert code == 0
    off = str(tmp_path / "off")
    code = query_job.main([
        "--index", out, "--query", "term0000 term0101", "--k", "5",
        "--start", "5", "--output", off])
    assert code == 0
    got = sorted((r["doc_id"], round(r["score"], 6)) for r in
                 spark.read.parquet(p2).collect())
    want = sorted((r["doc_id"], round(r["score"], 6)) for r in
                  spark.read.parquet(off).collect())
    assert got == want and got
