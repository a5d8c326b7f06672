"""Plan-shape pins: the physical-plan properties the engine's 100 TB
story depends on, asserted so refactors can't silently regress them.

Each test reads the executedPlan string — the same thing a human checks
with explain("formatted") — for: dimension joins staying broadcast,
filters reaching the parquet scan, scans pruning to the referenced
columns, and the bucketed layout eliminating the fact-join shuffle
(that last one lives in test_sinks_frames.py)."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_dimension_joins_are_broadcast(spark):
    from garmadon_spark.queries import tpch

    for name in ("tpch_region_revenue", "tpch_volume_shipping",
                 "tpch_promo_revenue", "tpch_discounted_revenue"):
        plan = _plan(getattr(tpch, name)(spark, SF))
        assert "BroadcastHashJoin" in plan, name
        # no dimension join may fall back to a shuffle join at this SF
        assert "SortMergeJoin" not in plan, name


def test_filtered_stats_filter_reaches_scan(spark):
    from garmadon_spark.queries.dashboard import ev_filtered_stats

    plan = _plan(ev_filtered_stats(spark, SF))
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "event_type" in scan.split("DataFilters")[-1]


def test_scans_prune_columns(spark):
    from garmadon_spark.queries.datapipe import doc_token_stats
    from garmadon_spark.queries.tpch import tpch_promo_revenue

    plan = _plan(tpch_promo_revenue(spark, SF))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas
    li = next(s for s in schemas if "l_partkey" in s)
    # 11-column lineitem must narrow to the 4 referenced columns
    assert len(li.split(",")) == 4, li

    plan = _plan(doc_token_stats(spark, SF))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert all("text" in s or "doc_id" in s for s in schemas)


def test_contamination_eval_side_is_broadcast(spark):
    from garmadon_spark.queries.datapipe import doc_contamination

    plan = _plan(doc_contamination(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    from pyspark.sql import Row

    from garmadon_spark.operators import similarity

    embs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), float(i % 3), 1.0])
         for i in range(64)]
    )
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(embs, path, n_centroids=4, iterations=1)
    probe = similarity.ivf_topk_from_index(
        spark, path, [1.0, 0.5, 1.0], k=5, nprobe=2
    )
    plan = _plan(probe)
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "ivf_cell" in l)
    # the nprobe IN-filter must appear as a PartitionFilter (planning-
    # time directory pruning), not a post-scan Filter
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert m and "ivf_cell" in m.group(1) and " IN " in m.group(1), scan
    assert probe.count() == 5
