"""Pre-flight replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB at
sf0.01, compare row count + schema-width + exact values (floats must be
bit-identical after the contractual rounding)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df):
    """pandas frame -> sorted-by-name columns, row-sorted tuples."""
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 9) if not math.isnan(v) else "NaN")
            else:
                row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_gate_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        # genuinely non-SQL-expressible op (e.g. iterative k-means):
        # the driver records the weaker rows-only check — mirror it
        assert name in entry_mod.NO_ORACLE_OK, \
            f"{name}: missing oracle SQL and not explicitly exempted"
        assert len(got) > 0, f"{name}: rows-only check failed"
        return
    exp = con.sql(sql).df()
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} != {len(exp)}"
    gcols, grows = _canon(got)
    ecols, erows = _canon(exp)
    assert gcols == ecols, f"{name}: columns {gcols} != {ecols}"
    assert grows == erows, f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"query_id", "rnk", "doc_id", "score_r"} == set(df.columns)
