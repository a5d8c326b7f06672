"""The doc-prefix-partitioned signature tree (r13): layout migration
(`ensure_sigs_layout`), the dp-pruned estimator fetch's
version-completeness (the r12 advisor's gate-hole scenario), the bands
stamp identity (`_BANDS`), the explicit-schema dtype guard on banded
reads, compaction under the subdivided layout, and the sig-index
health report."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import dedup
from garmadon_spark.streaming.corpus import (
    _banded_schema, _history_banded, _history_sigs,
)

SIG_DDL = "doc long, signature array<bigint>"


def _write_index(spark, root, rows_by_batch, bands=2, num_hashes=8,
                 flat=False):
    """rows_by_batch: {batch: [(doc, sig), ...]} → on-disk sigs+bands
    trees in the production layout (or the pre-r13 flat sigs layout)."""
    for b, rows in rows_by_batch.items():
        df = spark.createDataFrame(rows, SIG_DDL)
        if flat:
            df.coalesce(1).write.parquet(f"{root}/sigs/batch={b}")
        else:
            df.withColumn("dp", dedup.doc_prefix("doc")) \
                .write.partitionBy("dp").parquet(f"{root}/sigs/batch={b}")
        dedup.banded_signatures(df, bands, num_hashes // bands) \
            .write.partitionBy("band", "bp") \
            .parquet(f"{root}/bands/batch={b}")
    if not flat:
        with open(f"{root}/sigs/_DP_CHARS", "w") as fh:
            fh.write(str(dedup.SIG_DP_CHARS))
    dedup._write_bands_stamps(f"{root}/bands", bands)


def _sig_rows(spark, root):
    return {
        (int(r.batch), int(r.doc), tuple(r.signature))
        for r in spark.read.option("basePath", f"{root}/sigs")
        .parquet(f"{root}/sigs").select("batch", "doc", "signature")
        .collect()
    }


def test_ensure_sigs_layout_migrates_flat_tree(spark, tmp_path):
    """Upgrade path from the r12 flat layout: every batch partition is
    rewritten under dp= subdirs, rows bit-identical, stamp written,
    second call a no-op (file names untouched)."""
    root = str(tmp_path / "idx")
    rows = {0: [(1, [1, 2, 3, 4]), (2, [5, 6, 7, 8])],
            1: [(3, [9, 10, 11, 12])]}
    _write_index(spark, root, rows, flat=True)
    before = _sig_rows(spark, root)

    dedup.ensure_sigs_layout(spark, root)
    for b in (0, 1):
        entries = os.listdir(f"{root}/sigs/batch={b}")
        assert any(e.startswith("dp=") for e in entries), entries
        assert not any(e.endswith(".parquet") for e in entries), entries
    assert open(f"{root}/sigs/_DP_CHARS").read() \
        == str(dedup.SIG_DP_CHARS)
    assert _sig_rows(spark, root) == before
    # dp dirs carry the doc_prefix value
    got_dp = {
        (int(r.doc), r.dp)
        for r in _history_sigs(
            spark, f"{root}/sigs",
            spark.createDataFrame([], SIG_DDL).schema, -1).collect()
    }
    exp_dp = {
        (int(r.doc), r.dp)
        for r in spark.createDataFrame(
            [(d,) for d in (1, 2, 3)], "doc long")
        .select("doc", dedup.doc_prefix("doc").alias("dp")).collect()
    }
    assert got_dp == exp_dp

    def _tree_files():
        return sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(f"{root}/sigs") for f in fs
        )

    snapshot = _tree_files()
    dedup.ensure_sigs_layout(spark, root)    # idempotent no-op
    assert _tree_files() == snapshot


def test_ensure_sigs_layout_width_change_rewrites(
        spark, tmp_path, monkeypatch):
    """A prefix-width config change (directory names narrower than the
    build's SIG_DP_CHARS) rewrites EVERY batch partition — pruning
    against stale-width directories would miss candidate signatures.
    Width is read off the directory NAMES, not the stamp."""
    root = str(tmp_path / "idx")
    monkeypatch.setattr(dedup, "SIG_DP_CHARS", 1)
    _write_index(spark, root, {0: [(1, [1, 2, 3, 4])]})
    monkeypatch.undo()
    before = _sig_rows(spark, root)
    dedup.ensure_sigs_layout(spark, root)
    assert open(f"{root}/sigs/_DP_CHARS").read() \
        == str(dedup.SIG_DP_CHARS)
    for e in os.listdir(f"{root}/sigs/batch=0"):
        if e.startswith("dp="):
            assert len(e) == len("dp=") + dedup.SIG_DP_CHARS, e
    assert _sig_rows(spark, root) == before


def test_ensure_sigs_layout_missing_stamp_no_spurious_rewrite(
        spark, tmp_path):
    """A fresh dp-layout tree with no stamp yet (the writer created it
    before the first maintenance pass) must NOT be rewritten — width
    conformity is visible in the directory names; the pass just stamps
    it (reviewer finding r13)."""
    root = str(tmp_path / "idx")
    _write_index(spark, root, {0: [(1, [1, 2, 3, 4])]})
    os.remove(f"{root}/sigs/_DP_CHARS")

    def _tree_files():
        return sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(f"{root}/sigs") for f in fs
            if f.endswith(".parquet")
        )

    snapshot = _tree_files()
    dedup.ensure_sigs_layout(spark, root)
    assert _tree_files() == snapshot          # no rewrite
    assert open(f"{root}/sigs/_DP_CHARS").read() \
        == str(dedup.SIG_DP_CHARS)            # stamped for the fast path


def test_hist_sigs_dp_dtype_guard(spark):
    """A numeric-inferred dp column on the estimator fetch's index side
    would silently prune candidate signatures to nothing — refused
    (reviewer finding r13, the bp guard's twin)."""
    inc = spark.createDataFrame([(1, [1, 2, 3, 4])], SIG_DDL)
    hist = spark.createDataFrame(
        [(2, [5, 6, 7, 8], 12)], SIG_DDL + ", dp int")
    hb = spark.createDataFrame(
        [(2, 0, "ab12", "ab")],
        "doc long, band int, bucket string, bp string",
    )
    with pytest.raises(TypeError, match="_history_sigs"):
        dedup._flagged_increment_pairs(
            inc, hist, inc.select("doc"), num_hashes=4, bands=2,
            persist_sigs=False, hist_banded=hb,
        )


def test_incremental_exact_dedup_hp_guard_and_null_text(spark):
    """(1) A numeric-inferred hp column on the hash index is refused —
    the prefix prune would silently re-admit seen documents; (2) a NULL
    text row in the increment must not crash the literal collection and
    is admitted (a null hash can never match the index) — both reviewer
    findings r13."""
    bad = spark.createDataFrame([("abc", 7)],
                                "content_hash string, hp int")
    inc = spark.createDataFrame([(1, "alpha beta")],
                                "doc_id long, text string")
    with pytest.raises(TypeError, match="read_hash_index"):
        dedup.incremental_exact_dedup(inc, bad)
    idx = spark.createDataFrame(
        [("ffff", "ff")], "content_hash string, hp string")
    mixed = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string")
    out = dedup.incremental_exact_dedup(mixed, idx)
    assert {r.doc_id for r in out.collect()} == {1, 2}
    out._gs_unpersist()


def test_sig_index_health_survives_drifted_trees(spark, tmp_path):
    """The health probe must WORK on the broken states it diagnoses: a
    batch whose only files sit under _temporary (crashed write) and a
    mixed flat/dp-depth tree (crashed mid-migration) — neither may
    crash schema inference (reviewer finding r13)."""
    root = str(tmp_path / "idx")
    _write_index(spark, root, {0: [(1, [1, 2, 3, 4])]})
    # crashed write: batch 1 has only _temporary files
    df = spark.createDataFrame([(9, [9, 9, 9, 9])], SIG_DDL)
    os.makedirs(f"{root}/sigs/batch=1/_temporary", exist_ok=True)
    df.coalesce(1).write.parquet(f"{root}/sigs/_scratch")
    src = next(f for f in os.listdir(f"{root}/sigs/_scratch")
               if f.endswith(".parquet"))
    os.replace(f"{root}/sigs/_scratch/{src}",
               f"{root}/sigs/batch=1/_temporary/{src}")
    shutil.rmtree(f"{root}/sigs/_scratch")
    # crashed migration: batch 2 is flat while batch 0 is dp-subdivided
    df.coalesce(1).write.parquet(f"{root}/sigs/batch=2")
    r = dedup.sig_index_health(spark, root, bands=2).first()
    assert r.sig_batches == 3
    assert r.duplicate_docs == 0    # doc 9's only COMMITTED row: batch 2


def test_ensure_sigs_layout_crash_heal(spark, tmp_path):
    """Both crash windows of the three-step swap converge on re-entry:
    a backup WITHOUT its batch dir (crash between the two moves) is
    restored then re-migrated; a backup WITH one (crash before backup
    cleanup) is dropped."""
    root = str(tmp_path / "idx")
    rows = {0: [(1, [1, 2, 3, 4])], 1: [(2, [5, 6, 7, 8])]}
    _write_index(spark, root, rows, flat=True)
    before = _sig_rows(spark, root)
    # window 1: batch 0 moved to backup, stage never swapped in
    os.replace(f"{root}/sigs/batch=0", f"{root}/sigs/_dp_old_0")
    # window 2: batch 1 migrated AND backup left behind
    shutil.copytree(f"{root}/sigs/batch=1", f"{root}/sigs/_dp_old_1")
    dedup.ensure_sigs_layout(spark, root)
    assert not any(d.startswith("_dp_old_")
                   for d in os.listdir(f"{root}/sigs"))
    assert _sig_rows(spark, root) == before
    for b in (0, 1):
        assert any(e.startswith("dp=")
                   for e in os.listdir(f"{root}/sigs/batch={b}"))


def test_hist_banded_dtype_guard(spark, tmp_path):
    """A banded read whose bp column inferred non-string (digit-only
    hex directory names) would silently prune to NOTHING — the
    candidate join must refuse it instead (r12 advisor finding)."""
    inc = spark.createDataFrame([(1, [1, 2, 3, 4])], SIG_DDL)
    hist = spark.createDataFrame([], SIG_DDL)
    bad = spark.createDataFrame(
        [(2, 0, "ab12...", 12)],
        "doc long, band int, bucket string, bp int",
    )
    with pytest.raises(TypeError, match="explicit schema"):
        dedup._flagged_increment_pairs(
            inc, hist, inc.select("doc"), num_hashes=4, bands=2,
            persist_sigs=False, hist_banded=bad,
        )


def test_pruned_fetch_covers_all_signature_versions(spark, tmp_path):
    """The r12 advisor's gate hole, pinned closed: doc 100 holds TWO
    signature versions (same-id re-admission window) in different
    batches; the increment collides only with the NEWER version's
    bucket, but its estimated Jaccard vs the OLDER version is what
    crosses the threshold.  The r12 batch-prune fetched only the hit
    batch (missing v1, max-est over a subset → wrongly admitted); the
    dp-prune is version-complete by construction (every version of a
    doc shares its dp), so the pruned path must agree with the
    re-banding path: REJECT.

    Engineered signatures (num_hashes=8, bands=2, rows_per_band=4,
    threshold=0.7): v1 agrees with the increment on 6/8 positions
    (est 0.75 ≥ 0.7) but never on a full band (no bucket collision);
    v2 shares a full band (collision → candidacy) but agrees on only
    4/8 (est 0.5 < 0.7)."""
    num_hashes, bands, thr = 8, 2, 0.7
    v1 = [1, 2, 3, 4, 5, 6, 7, 8]
    v2 = [1, 2, 3, 99, 50, 60, 70, 80]
    inc_sig = [1, 2, 3, 99, 5, 6, 7, 99]
    root = str(tmp_path / "idx")
    _write_index(spark, root, {
        0: [(100, v1)],                     # old version of doc 100
        1: [(7, [11, 12, 13, 14, 15, 16, 17, 18])],
        2: [(100, v2)],                     # re-admitted version
    }, bands=bands, num_hashes=num_hashes)
    schema = spark.createDataFrame([], SIG_DDL).schema
    hist = _history_sigs(spark, f"{root}/sigs", schema, 99)
    hb = _history_banded(spark, f"{root}/bands", schema, 99)
    inc = spark.createDataFrame([(200, inc_sig)], SIG_DDL)
    anti = inc.select("doc")

    def run(hist_df, hist_banded):
        out = dedup._flagged_increment_pairs(
            inc, hist_df, anti, num_hashes=num_hashes, bands=bands,
            threshold=thr, persist_sigs=False, hist_banded=hist_banded,
        )
        return {(r.doc_a, r.doc_b, r.est_jaccard)
                for r in out.collect()}

    full = run(hist.select("doc", "signature"), None)
    pruned = run(hist, hb)
    assert pruned == full
    # and the decision is the REJECTION the subset fetch would miss:
    # the 0.75 estimate against v1, reached through v2's bucket
    assert {(200, 100, 0.75)} == {t for t in full if 100 in t[:2]} \
        or {(100, 200, 0.75)} == {t for t in full if 100 in t[:2]}


def test_compact_sig_index_dp_layout(spark, tmp_path):
    """compact_sig_index under the subdivided layout: folds
    latest-batch-wins into dp= subdirs of the oldest partition,
    removes a crashed attempt's same-prefix leftover INSIDE a dp
    subdir (the recursive exact-set delete), migrates any flat
    stragglers first, and leaves zero duplicate rows."""
    root = str(tmp_path / "idx")
    v2 = [91, 92, 93, 94]
    _write_index(spark, root, {
        0: [(1, [1, 2, 3, 4]), (2, [5, 6, 7, 8])],
        1: [(3, [9, 10, 11, 12])],
        2: [(1, v2)],                     # same-id REPLACE of doc 1
        3: [(9, [13, 14, 15, 16])],       # keep_last survivor
    }, bands=2, num_hashes=4)
    # a crashed earlier fold attempt's leftover inside a dp subdir
    tgt = f"{root}/sigs/batch=0"
    dpd = next(d for d in os.listdir(tgt) if d.startswith("dp="))
    a_file = next(f for f in os.listdir(f"{tgt}/{dpd}")
                  if f.endswith(".parquet"))
    shutil.copy(f"{tgt}/{dpd}/{a_file}",
                f"{tgt}/{dpd}/fold-0-2-99.parquet")

    assert dedup.compact_sig_index(spark, root, bands=2) == [0, 1, 2]
    assert not os.path.exists(f"{tgt}/{dpd}/fold-0-2-99.parquet")
    # every published file is fold-keyed, inside a dp subdir
    for r, _d, fs in os.walk(tgt):
        for f in fs:
            if f.endswith(".parquet"):
                assert os.path.basename(r).startswith("dp="), (r, f)
                assert f.startswith("fold-0-2-"), f
    folded = spark.read.option("basePath", f"{root}/sigs") \
        .parquet(f"{root}/sigs")
    rows = {int(r.doc): tuple(r.signature)
            for r in folded.select("doc", "signature").collect()}
    assert folded.count() == len(rows) == 4        # 1,2,3,9 — no dups
    assert rows[1] == tuple(v2)                    # latest batch won
    # banded twins track the fold
    assert dedup._sig_batch_ids(f"{root}/bands") == [0, 3]


def test_compact_bands_stamp_mismatch_rebuilds_tree(spark, tmp_path):
    """A maintenance job invoked with a band count that differs from
    the tree's stamped bucketing must NOT fold a twin with wrong
    hashes (the pruned read would silently miss docs) — the whole
    derived tree is rebuilt at the new count, stamps updated (r12
    advisor finding)."""
    root = str(tmp_path / "idx")
    _write_index(spark, root, {
        0: [(1, [1, 2, 3, 4]), (2, [5, 6, 7, 8])],
        1: [(3, [9, 10, 11, 12])],
        2: [(4, [21, 22, 23, 24])],
    }, bands=2, num_hashes=4)
    assert dedup.compact_sig_index(spark, root, bands=4) == [0, 1]
    assert open(f"{root}/bands/_BANDS").read() == "4"
    assert open(f"{root}/bands/_BP_CHARS").read() \
        == str(dedup.SIG_BP_CHARS)
    assert dedup._sig_batch_ids(f"{root}/bands") == [0, 2]
    # the rebuilt twins band at the NEW count: 4 bands of 1 row
    schema = spark.createDataFrame([], SIG_DDL).schema
    hb = _history_banded(spark, f"{root}/bands", schema, -1)
    assert {int(r.band) for r in hb.select("band").collect()} \
        == {0, 1, 2, 3}


def test_sig_index_health(spark, tmp_path):
    """The health report counts partitions-since-fold, duplicate doc
    rows (the REPLACE window), banded-twin divergence, and stamp
    identity — all from listings plus one doc-column scan."""
    root = str(tmp_path / "idx")
    _write_index(spark, root, {
        0: [(1, [1, 2, 3, 4])],
        1: [(2, [5, 6, 7, 8])],
        2: [(1, [9, 9, 9, 9])],           # same-id re-admission
        3: [(5, [2, 4, 6, 8])],
    }, bands=2, num_hashes=4)
    shutil.rmtree(f"{root}/bands/batch=2")          # missing twin
    os.makedirs(f"{root}/bands/batch=7")            # orphan twin
    r = dedup.sig_index_health(spark, root, bands=2).first()
    assert (r.sig_batches, r.batches_since_fold) == (4, 4)
    assert r.duplicate_docs == 1
    assert (r.banded_missing, r.banded_orphans) == (1, 1)
    assert bool(r.stamps_ok)
    # after a fold: pending batches collapse, duplicates healed, the
    # missing twin folded away, the orphan removed by the heal
    dedup.compact_sig_index(spark, root, bands=2)
    r2 = dedup.sig_index_health(spark, root, bands=2).first()
    assert (r2.sig_batches, r2.batches_since_fold) == (2, 1)
    assert r2.duplicate_docs == 0
    assert (r2.banded_missing, r2.banded_orphans) == (0, 0)


def test_banded_schema_dtypes(spark):
    """The explicit banded-read schema carries the dtypes the guard
    demands, whatever the directory names look like."""
    schema = _banded_schema(
        spark.createDataFrame([], SIG_DDL).schema)
    dt = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert dt["bp"] == "string" and dt["band"] == "int"
    assert dt["bucket"] == "string"
