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


def test_hash_index_layout_stamp(spark, tmp_path):
    """The hp tree's _LAYOUT width stamp (r13 advisor): a HASH_HP_CHARS
    change between deployments must REFUSE at the writer, reader, and
    compactor — a silent width mismatch makes the pruned anti-join's
    isin(new-width prefixes) match zero partitions and re-admits SEEN
    documents."""
    docs = _docs(spark).filter(F.col("doc_id") < 10)
    hashes = docs.select(dedup.content_hash("text").alias("content_hash"))
    path = str(tmp_path / "hidx")
    dedup.write_hash_index(hashes, path)
    stamp = os.path.join(path, "_LAYOUT")
    assert open(stamp).read() == f"hp={dedup.HASH_HP_CHARS}"
    # a tree stamped at another width: every entry point refuses
    with open(stamp, "w") as fh:
        fh.write("hp=3")
    with pytest.raises(ValueError, match="layout"):
        dedup.write_hash_index(hashes, path)
    with pytest.raises(ValueError, match="layout"):
        dedup.read_hash_index(spark, path)
    with pytest.raises(ValueError, match="layout"):
        dedup.compact_hash_index(spark, path)
    # overwrite rebuilds from scratch and re-stamps
    dedup.write_hash_index(hashes, path, mode="overwrite")
    assert open(stamp).read() == f"hp={dedup.HASH_HP_CHARS}"
    assert dedup.read_hash_index(spark, path).count() == hashes.count()


def test_unstamped_nonempty_tree_refused(spark, tmp_path):
    """Data with no stamp = unknowable layout (a pre-stamp-era crash):
    appending would stamp this writer's layout over possibly
    differently-parameterized rows — refused for both prefix trees."""
    docs = _docs(spark).filter(F.col("doc_id") < 10)
    hashes = docs.select(dedup.content_hash("text").alias("content_hash"))
    hpath = str(tmp_path / "hidx")
    dedup.write_hash_index(hashes, hpath)
    os.remove(os.path.join(hpath, "_LAYOUT"))
    with pytest.raises(ValueError, match="no _LAYOUT"):
        dedup.write_hash_index(hashes, hpath)
    spath = str(tmp_path / "sidx")
    dedup.write_simhash_index(dedup.simhash(docs), spath)
    os.remove(os.path.join(spath, "_LAYOUT"))
    with pytest.raises(ValueError, match="no _LAYOUT"):
        dedup.write_simhash_index(dedup.simhash(docs), spath)
    # stamp-before-data: on a FRESH tree the stamp is what commits
    # first, so the crash window (stamp, no data) is harmless — an
    # append adopts it
    fresh = str(tmp_path / "fresh")
    os.makedirs(fresh)
    with open(os.path.join(fresh, "_LAYOUT"), "w") as fh:
        fh.write(dedup._simhash_layout(14, 4))
    dedup.write_simhash_index(dedup.simhash(docs), fresh)
    assert dedup.read_simhash_index(spark, fresh).count() > 0


def test_compactors_rederive_prefixes(spark, tmp_path):
    """The fold recomputes hp/cp from the DATA columns (the
    compact_sig_index-re-derives-dp rule): rows mis-homed under a wrong
    prefix directory (a stale-width append, a buggy external writer)
    are invisible to the pruned read — one fold re-homes them and the
    pruned lookup finds them again."""
    docs = _docs(spark)
    hist = docs.filter(F.col("doc_id") < 20)
    hpath = str(tmp_path / "hidx")
    hashes = hist.select(dedup.content_hash("text").alias("content_hash"))
    dedup.write_hash_index(hashes, hpath)
    # mis-home every row: append the same hashes under hp='zz' (no
    # real hash prefix — planning-time pruning can never select it)
    hashes.withColumn("hp", F.lit("zz")).write.mode("append") \
        .partitionBy("hp").parquet(hpath)
    assert os.path.isdir(os.path.join(hpath, "hp=zz"))
    dedup.compact_hash_index(spark, hpath)
    assert not os.path.isdir(os.path.join(hpath, "hp=zz"))
    folded = dedup.read_hash_index(spark, hpath)
    assert folded.filter(
        F.col("hp") != dedup.hash_prefix("content_hash")).count() == 0
    # and the pruned anti-join still sees every seen doc
    out = dedup.incremental_exact_dedup(hist, folded)
    assert out.count() == 0
    out._gs_unpersist()

    spath = str(tmp_path / "sidx")
    dedup.write_simhash_index(dedup.simhash(hist), spath)
    ch = dedup.chunked_fingerprints(dedup.simhash(hist))
    ch.withColumn("cp", F.lit("zz")).write.mode("append") \
        .partitionBy("chunk", "cp").parquet(spath)
    dedup.compact_simhash_index(spark, spath)
    idx = dedup.read_simhash_index(spark, spath)
    assert idx.filter(F.col("cp") == "zz").count() == 0
    # every re-homed row prunable again: re-scrapes hit at Hamming 0
    inc = hist.withColumn("doc_id", F.col("doc_id") + 10**9)
    pairs = dedup.incremental_simhash(inc, None, hist_chunked=idx)
    n_zero = pairs.filter(F.col("hamming") == 0).count()
    assert n_zero >= hist.count()
    pairs._gs_unpersist()


def test_prefix_tree_health_survives_drifted_trees(spark, tmp_path):
    """The hp/cp drift watch reports on exactly the broken trees it
    diagnoses: per-append file pileup, retried-append duplicate rows,
    missing/mismatched stamps — without raising — and goes clean after
    a fold."""
    docs = _docs(spark).filter(F.col("doc_id") < 20)
    hashes = docs.select(dedup.content_hash("text").alias("content_hash"))
    hpath = str(tmp_path / "hidx")
    dedup.write_hash_index(hashes, hpath)
    dedup.write_hash_index(hashes, hpath)      # retried append
    r = dedup.prefix_tree_health(
        spark, hpath, "content_hash string, hp string",
        ["content_hash"], dedup._hash_layout(),
    ).first()
    assert r.stamp_ok and r.dup_rows == hashes.count()
    assert r.max_files_per_partition >= 2
    dedup.compact_hash_index(spark, hpath)
    r = dedup.prefix_tree_health(
        spark, hpath, "content_hash string, hp string",
        ["content_hash"], dedup._hash_layout(),
    ).first()
    assert r.dup_rows == 0 and r.max_files_per_partition == 1
    # a hand-broken stamp: reported, not raised
    os.remove(os.path.join(hpath, "_LAYOUT"))
    r = dedup.prefix_tree_health(
        spark, hpath, "content_hash string, hp string",
        ["content_hash"], dedup._hash_layout(),
    ).first()
    assert not r.stamp_ok and r.n_files > 0

    spath = str(tmp_path / "sidx")
    dedup.write_simhash_index(dedup.simhash(docs), spath)
    dedup.write_simhash_index(
        dedup.simhash(docs.filter(F.col("doc_id") < 10)), spath)
    ddl = ("doc bigint, simhash bigint, chunk int, val bigint,"
           " cp string")
    cols = ["doc", "simhash", "chunk", "val"]
    r = dedup.prefix_tree_health(
        spark, spath, ddl, cols, dedup._simhash_layout(14, 4)).first()
    assert r.stamp_ok and r.dup_rows > 0
    dedup.compact_simhash_index(spark, spath)
    r = dedup.prefix_tree_health(
        spark, spath, ddl, cols, dedup._simhash_layout(14, 4)).first()
    assert r.stamp_ok and r.dup_rows == 0
    # wrong-parameter expectation → stamp mismatch reported
    r = dedup.prefix_tree_health(
        spark, spath, ddl, cols, dedup._simhash_layout(8, 8)).first()
    assert not r.stamp_ok
    # an empty/unborn tree: all zeros, no raise
    r = dedup.prefix_tree_health(
        spark, str(tmp_path / "nope"), ddl, cols, "x").first()
    assert r.n_files == 0 and r.dup_rows == 0 and not r.stamp_ok
