"""K5 result sink: relational split parity with init.sql:1-26 and the
write path round-trip (parquet fallback; JDBC leg capability-gated —
no MySQL driver jar in this sandbox)."""

from __future__ import annotations

import pytest

from garmadon_spark.heuristics.base import Severity, assemble_results
from garmadon_spark.sinks import results as rs


@pytest.fixture()
def assembled(spark):
    per_c = spark.createDataFrame(
        [
            ("app_1", "1", "container_01", Severity.SEVERE, "91.0% heap"),
            ("app_1", "1", "container_02", Severity.LOW, "62.0% heap"),
            ("app_2", "1", "container_03", Severity.NONE, "10.0% heap"),
        ],
        "application_id string, attempt_id string, container_id string, "
        "severity int, detail string",
    )
    return assemble_results(per_c, "HeapUsage")


def test_result_table_shape(assembled):
    res, det = rs.to_result_tables(assembled)
    assert [f.name for f in res.schema.fields] == [
        "id", "yarn_app_result_id", "heuristic_class", "heuristic_name",
        "severity", "score", "ready", "read_times",
    ]
    assert [f.name for f in det.schema.fields] == [
        "yarn_app_heuristic_result_id", "name", "value", "details",
    ]
    rows = {r.yarn_app_result_id: r for r in res.collect()}
    assert rows["app_1"].severity == Severity.SEVERE
    assert rows["app_1"].heuristic_name == "HeapUsage@1"
    assert rows["app_1"].heuristic_class.endswith(".HeapUsage")
    assert rows["app_1"].ready is True and rows["app_1"].read_times == 0


def test_detail_rows_join_on_deterministic_id(assembled):
    res, det = rs.to_result_tables(assembled)
    joined = det.join(
        res, det.yarn_app_heuristic_result_id == res.id
    ).collect()
    # app_1 has 2 container details, app_2 has 1 — every detail resolves
    assert len(joined) == det.count() == 3
    # ids are stable across re-computation (retry idempotence)
    res2, _ = rs.to_result_tables(assembled)
    assert sorted(r.id for r in res.collect()) == sorted(
        r.id for r in res2.collect()
    )


def test_parquet_round_trip(spark, assembled, tmp_path):
    rs.write_results(assembled, path=str(tmp_path), mode="overwrite")
    res, det = rs.read_results(spark, str(tmp_path))
    assert res.count() == 2 and det.count() == 3
    res1, det1 = rs.to_result_tables(assembled)
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, res1.collect())
    )
    assert sorted(map(tuple, det.collect())) == sorted(
        map(tuple, det1.collect())
    )


def test_jdbc_leg_gated(spark, assembled):
    if rs.jdbc_capable(spark):
        pytest.skip("MySQL driver present; gate test is for its absence")
    with pytest.raises(RuntimeError, match="not on the classpath"):
        rs.write_results(assembled, jdbc_url="jdbc:mysql://localhost/g")


def test_exactly_one_destination(assembled):
    with pytest.raises(ValueError):
        rs.write_results(assembled)
    with pytest.raises(ValueError):
        rs.write_results(
            assembled, jdbc_url="jdbc:mysql://x/y", path="/tmp/z"
        )
