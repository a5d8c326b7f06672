"""End-to-end correctness: every declared query with an oracle hash-matches
DuckDB on the sf0.001 fixture — the same gate the driver runs at sf0.01."""

from __future__ import annotations

import os

import duckdb
import pytest

from garmadon_spark.queries import all_queries
from garmadon_spark.session import TPCH_TABLES

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.verify_oracle import table_hash  # noqa: E402

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert srows is not None  # rows-only check: runs without error
        return
    res = duck.sql(sql)
    dcols = [c.lower() for c in res.columns]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(scols, srows) == table_hash(dcols, drows)
