"""Tokenizer contract: the three renderings (Spark / Python / DuckDB)
must be byte-identical — the whole rank-identity story rests on this."""

import duckdb
from pyspark.sql import functions as F

from solr_indexer_spark.analysis import tokenize_col, tokenize_py, tokenize_sql

CASES = [
    "Hello, World 42!",
    "the THE The tHe",
    "",
    "   ",
    "a-b_c.d:e/f",
    "x1y2z3 007 agent",
    "trailing space ",
    "tab\tand\nnewline",
]


def test_three_renderings_identical(spark):
    py = [tokenize_py(t) for t in CASES]

    sdf = spark.createDataFrame([(t,) for t in CASES], "text string")
    sp = [r["toks"] for r in
          sdf.select(tokenize_col("text").alias("toks")).collect()]

    con = duckdb.connect()
    dk = []
    for t in CASES:
        dk.append(con.sql(
            f"SELECT {tokenize_sql('?::VARCHAR')} AS toks", params=[t]
        ).fetchall()[0][0])

    assert py == sp == dk


def test_none_and_empty():
    assert tokenize_py(None) == []
    assert tokenize_py("") == []
    assert tokenize_py("!!!") == []
