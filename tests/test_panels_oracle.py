"""Garmadon-native dashboard panels (queries/panels.py) vs DuckDB on the
fixture event tables — the §2.7 surface on the REAL event families."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from garmadon_spark.queries.panels import PANELS
from garmadon_spark.sources import fixtures


@pytest.fixture(scope="module")
def panel_env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("garmadon_panels"))
    fixtures.write_parquet(spark, d, n_apps=6, seed=11)
    con = duckdb.connect()
    # every table any panel reads — derived from the registry so a new
    # panel over a new event family can't silently miss the fixture
    tables = sorted({table for table, _fn, _sql, _pre in PANELS.values()})
    for name in tables:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM '{os.path.join(d, name + '.parquet', '*.parquet')}'"
        )
    # E4 heap extract as a DuckDB view over the nested sections — the
    # oracle-side equivalent of operators.jvmstats.explode_heap
    # row-preserving projection (NOT a group-by): the fixtures contain
    # intentionally replayed duplicate events (W8 dedup surface), and a
    # grouped pivot would collapse them while Spark's explode_heap keeps
    # one output row per input row
    con.sql("""
        CREATE VIEW jvmstats_heap AS
        SELECT application_id, container_id, timestamp,
               kafka_partition, kafka_offset,
               TRY_CAST(list_extract(
                   list_filter(hp, x -> x.name = 'used'), 1
               ).value AS BIGINT) AS heap_used,
               TRY_CAST(list_extract(
                   list_filter(hp, x -> x.name = 'max'), 1
               ).value AS BIGINT) AS heap_max
        FROM (SELECT *, list_extract(
                  list_filter(section, s -> s.name = 'heap'), 1
              ).property AS hp
              FROM jvmstats_event)
    """)
    dfs = {
        name: spark.read.parquet(os.path.join(d, f"{name}.parquet"))
        for name in tables
    }
    return con, dfs


def _canon(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 4)
    return v


@pytest.mark.parametrize("panel", sorted(PANELS))
def test_panel_matches_oracle(panel, panel_env):
    con, dfs = panel_env
    table, fn, sql, _pre = PANELS[panel]
    sdf = fn(dfs[table])
    scols = [c.lower() for c in sdf.columns]
    srows = sorted(tuple(_canon(v) for v in r) for r in sdf.collect())
    res = con.sql(sql)
    ocols = [c.lower() for c in res.columns]
    orows = sorted(tuple(_canon(v) for v in r) for r in res.fetchall())
    assert scols == ocols, f"{panel}: columns {scols} != {ocols}"
    assert len(srows) == len(orows), f"{panel}: {len(srows)} vs {len(orows)} rows"
    assert srows == orows, f"{panel}: first diff " + str(
        next((a, b) for a, b in zip(srows, orows) if a != b)
    )
