"""The materialized SimHash chunk index (r13): write/read layout
identity, pruned↔re-chunking decision parity, planning-time partition
pruning, and the dtype guard — the tier-4 twin of the minhash banded
index's test surface."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import dedup
from garmadon_spark.session import load_table


def _docs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")


def _build_index(spark, tmp_path, hist):
    path = str(tmp_path / "shidx")
    dedup.write_simhash_index(dedup.simhash(hist), path,
                              mode="overwrite")
    return path


def test_simhash_pruned_parity_and_recall(spark, tmp_path):
    """The pruned path (hist_chunked=) and the re-chunking path emit
    IDENTICAL (doc_a, doc_b, hamming) pairs on an increment mixing
    fresh docs and exact re-scrapes — and the re-scrapes surface at
    Hamming 0 (identical normalized text ⇒ identical fingerprint)."""
    docs = _docs(spark)
    hist = docs.filter(F.col("doc_id") < 40)
    path = _build_index(spark, tmp_path, hist)
    inc = (
        docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 55))
        .unionByName(
            hist.filter(F.col("doc_id") < 3)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10**12)))
    )
    pruned_df = dedup.incremental_simhash(
        inc, None,
        hist_chunked=dedup.read_simhash_index(spark, path))
    pruned = {(r.doc_a, r.doc_b, r.hamming) for r in pruned_df.collect()}
    pruned_df._gs_unpersist()
    base_df = dedup.incremental_simhash(inc, dedup.simhash(hist))
    base = {(r.doc_a, r.doc_b, r.hamming) for r in base_df.collect()}
    assert pruned == base
    zero = {(a, b) for a, b, h in pruned if h == 0}
    for s in range(3):
        assert (s, s + 10**12) in zero or (s + 10**12, s) in zero


def test_simhash_pruned_read_prunes_partitions(spark, tmp_path):
    """The history side of the pruned candidate join is a parquet read
    carrying chunk AND cp as PARTITION filters — planning-time pruning,
    never a re-chunk of the stored table."""
    docs = _docs(spark)
    hist = docs.filter(F.col("doc_id") < 40)
    path = _build_index(spark, tmp_path, hist)
    inc = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 43))
    out = dedup.incremental_simhash(
        inc, None,
        hist_chunked=dedup.read_simhash_index(spark, path))
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    out._gs_unpersist()
    scans = [ln for ln in plan.splitlines()
             if "FileScan" in ln and "shidx" in ln]
    assert scans, plan
    for scan in scans:
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
        assert m and "chunk" in m.group(1) and "cp" in m.group(1), scan


def test_simhash_index_layout_identity(spark, tmp_path):
    """Appending or reading with mismatched chunk parameters is refused
    — a silent mismatch would chunk rows differently from the tree and
    the pruned read would MISS candidates."""
    docs = _docs(spark).filter(F.col("doc_id") < 10)
    path = str(tmp_path / "shidx")
    dedup.write_simhash_index(dedup.simhash(docs), path)
    assert open(os.path.join(path, "_LAYOUT")).read() \
        == dedup._simhash_layout(14, 4)
    with pytest.raises(ValueError, match="layout"):
        dedup.write_simhash_index(dedup.simhash(docs), path,
                                  chunk_bits=8)
    with pytest.raises(ValueError, match="layout"):
        dedup.read_simhash_index(spark, path, n_chunks=8)


def test_simhash_chunked_dtype_guard(spark):
    """An inferred-numeric cp column (digit-only hex directories) must
    be refused, not silently pruned to nothing."""
    inc = spark.createDataFrame([(1, "alpha beta gamma")],
                                "doc_id long, text string")
    bad = spark.createDataFrame(
        [(2, 7, 0, 5, 12)],
        "doc long, simhash bigint, chunk int, val bigint, cp int",
    )
    with pytest.raises(TypeError, match="read_simhash_index"):
        dedup.incremental_simhash(inc, None, hist_chunked=bad)


def test_simhash_missing_history_args(spark):
    inc = spark.createDataFrame([(1, "alpha beta gamma")],
                                "doc_id long, text string")
    with pytest.raises(ValueError, match="hist_fps"):
        dedup.incremental_simhash(inc, None)


def test_compact_prefix_indexes(spark, tmp_path):
    """Compaction for the two append-only prefix indexes: per-append
    tiny files fold to one per partition, retried-append duplicate rows
    drop, membership and incremental results are unchanged, a crashed
    attempt's leftovers converge on the next fold, and appends landing
    after the fold ride into the next one."""
    docs = _docs(spark)
    hist = docs.filter(F.col("doc_id") < 40)
    inc = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))

    def count_files(p):
        n = 0
        for r, dns, fs in os.walk(p):
            dns[:] = [d for d in dns if not d.startswith(("_", "."))]
            n += sum(f.endswith(".parquet") for f in fs)
        return n

    # --- hash index: three appends, one an exact retry duplicate ----
    hpath = str(tmp_path / "hidx")
    hashes = hist.select(
        dedup.content_hash("text").alias("content_hash"))
    half = hist.filter(F.col("doc_id") < 20).select(
        dedup.content_hash("text").alias("content_hash"))
    dedup.write_hash_index(hashes, hpath)
    dedup.write_hash_index(half, hpath)       # retried append
    dedup.write_hash_index(half, hpath)
    before_rows = {r.content_hash for r in
                   dedup.read_hash_index(spark, hpath).collect()}
    out0 = dedup.incremental_exact_dedup(
        inc, dedup.read_hash_index(spark, hpath))
    exp = {(r.doc_id, r.content_hash) for r in out0.collect()}
    out0._gs_unpersist()
    n_before = count_files(hpath)
    assert dedup.compact_hash_index(spark, hpath) == n_before
    assert count_files(hpath) < n_before
    after = dedup.read_hash_index(spark, hpath)
    assert {r.content_hash for r in after.collect()} == before_rows
    # exact-duplicate rows dropped: one row per distinct hash
    assert after.count() == len(before_rows)
    out1 = dedup.incremental_exact_dedup(inc, after)
    assert {(r.doc_id, r.content_hash) for r in out1.collect()} == exp
    out1._gs_unpersist()
    # an append after the fold rides into the next fold
    dedup.write_hash_index(half, hpath)
    assert dedup.compact_hash_index(spark, hpath) > 0
    assert dedup.read_hash_index(spark, hpath).count() \
        == len(before_rows)

    # --- simhash chunk index ----------------------------------------
    spath = str(tmp_path / "sidx")
    dedup.write_simhash_index(dedup.simhash(hist), spath)
    dedup.write_simhash_index(
        dedup.simhash(hist.filter(F.col("doc_id") < 10)), spath)
    pre = dedup.incremental_simhash(
        inc, None,
        hist_chunked=dedup.read_simhash_index(spark, spath))
    exp_pairs = {(r.doc_a, r.doc_b, r.hamming) for r in pre.collect()}
    pre._gs_unpersist()
    n_before = count_files(spath)
    assert dedup.compact_simhash_index(spark, spath) == n_before
    assert count_files(spath) < n_before
    post = dedup.incremental_simhash(
        inc, None,
        hist_chunked=dedup.read_simhash_index(spark, spath))
    assert {(r.doc_a, r.doc_b, r.hamming)
            for r in post.collect()} == exp_pairs
    post._gs_unpersist()
    # one row per (doc, chunk): retried-append duplicates dropped
    idx = dedup.read_simhash_index(spark, spath)
    assert idx.count() == idx.select("doc", "chunk").distinct().count()
    # layout identity: folding at the wrong width is refused
    with pytest.raises(ValueError, match="layout"):
        dedup.compact_simhash_index(spark, spath, chunk_bits=8)
