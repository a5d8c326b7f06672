"""ANN index lifecycle: blue/green re-train (atomic root swap, marker
carry-forward, unmarked-batch exclusion) and recall-after-drift
telemetry.  Reference contract mirrored by the swap:
ProtoParquetWriterWithOffset.java:82-135 (temp→final commit)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import similarity
from garmadon_spark.session import load_table


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _drifted(embs, n):
    return embs.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "label",
    )


def test_retrain_blue_green_swap(spark, embs, tmp_path):
    """Re-train rebuilds the quantizer from the index's own rows and
    atomically swaps: row set preserved exactly, every vector sits in
    its nearest-NEW-centroid cell, probes read the new layout, and no
    staging debris survives."""
    n = embs.count()
    path = str(tmp_path / "idx")
    similarity.write_ivf_index(embs, path, n_centroids=8, iterations=1)
    similarity.append_to_ivf_index(_drifted(embs, n), path)
    before = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{path}/vectors")
        .select("vec_id").collect()
    )

    cents = similarity.retrain_ivf_index(spark, path, n_centroids=12)
    assert len(cents) == 12
    assert spark.read.parquet(f"{path}/centroids").count() == 12
    after_df = spark.read.parquet(f"{path}/vectors")
    assert sorted(r.vec_id for r in after_df.select("vec_id")
                  .collect()) == before
    # layout is consistent with the NEW quantizer
    expect = {
        r.vec_id: r.ivf_cell
        for r in similarity.assign_cells(
            after_df.drop("ivf_cell"), cents).collect()
    }
    got = {r.vec_id: r.ivf_cell for r in after_df.collect()}
    assert got == expect
    # no staging debris
    assert not os.path.isdir(path + "._retrain")
    assert not os.path.isdir(path + "._retrain_old")
    # probe works against the re-trained tree
    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    top = similarity.ivf_topk_from_index(
        spark, path, q, k=5, nprobe=12, exclude_ids=[0]).collect()
    assert len(top) == 5 and top[0].cosine >= top[-1].cosine


def _streamed_index(spark, embs, root):
    """An index built from the even vec_ids with the odd ones streamed
    in as two marked maintain-batches; returns (index, drain, uncommit,
    new)."""
    from garmadon_spark.streaming import ann

    index = f"{root}/idx"
    similarity.write_ivf_index(
        embs.filter(F.col("vec_id") % 2 == 0), index,
        n_centroids=4, iterations=1,
    )
    src = f"{root}/new_vectors"
    new = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    new.filter(F.col("vec_id") % 4 == 1).write.mode("append").parquet(src)
    new.filter(F.col("vec_id") % 4 == 3).write.mode("append").parquet(src)

    def drain(ckpt):
        q = ann.maintain_ann_index_stream(
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            index, f"{root}/{ckpt}",
        ).start()
        q.awaitTermination()

    def uncommit():
        # drop the newest commit (and its checksum sidecar) so the SAME
        # checkpoint re-runs its final batch on the next start —
        # Structured Streaming only ever replays the LAST uncommitted
        # batch, so this is the one replay shape production can see
        commits = f"{root}/ckpt/commits"
        last = sorted(f for f in os.listdir(commits) if f.isdigit())[-1]
        os.remove(f"{commits}/{last}")
        try:
            os.remove(f"{commits}/.{last}.crc")
        except FileNotFoundError:
            pass

    drain("ckpt")
    return index, drain, uncommit, new


def test_retrain_carries_markers_replay_short_circuits(
        spark, embs, tmp_path):
    """Committed batches' markers ride into the re-trained tree WITH
    their content — run scoping survives the retrain, so (a) a replay
    of the final batch short-circuits on its CARRIED marker (its rows
    are already baked into the retrained corpus — re-publishing would
    duplicate them) and (b) a FRESH checkpoint over the retrained index
    is still refused (an empty carried marker would read as legacy
    own-marker and silently skip/duplicate re-numbered batches)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    n_total = embs.count()
    index, drain, uncommit, _ = _streamed_index(spark, embs, tmp_path)
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert len(markers) == 2
    contents = {os.path.basename(m): open(m).read() for m in markers}
    # the maintainer run-scopes its markers; the carry must preserve it
    assert all(c.startswith("done:") for c in contents.values())
    vec = f"{index}/vectors"

    similarity.retrain_ivf_index(spark, index, n_centroids=8)
    carried = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert {os.path.basename(m): open(m).read()
            for m in carried} == contents
    assert spark.read.parquet(vec).count() == n_total

    uncommit()
    drain("ckpt")
    after = spark.read.parquet(vec)
    assert after.count() == n_total
    assert after.select("vec_id").distinct().count() == n_total

    with pytest.raises(StreamingQueryException,
                       match="different streaming incarnation"):
        drain("ckpt2")


def test_retrain_excludes_unmarked_exactly_once(spark, embs, tmp_path):
    """The crash window: the final batch published its files but lost
    its marker.  The retrain EXCLUDES those rows from the rebuild (they
    will replay) and does not carry the lost marker, so the replay on
    the original checkpoint re-publishes them into the new tree exactly
    once."""
    n_total = embs.count()
    index, drain, uncommit, new = _streamed_index(spark, embs, tmp_path)
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert len(markers) == 2
    kept_content = open(markers[0]).read()
    vec = f"{index}/vectors"

    # final batch published, marker lost
    os.remove(markers[1])
    lost = os.path.basename(markers[1])
    n_lost = new.filter(F.col("vec_id") % 4 == 3).count()

    similarity.retrain_ivf_index(spark, index, n_centroids=8)

    # committed batch's marker carried (with content); unmarked batch's
    # rows excluded from the rebuild
    left = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert [os.path.basename(m) for m in left] == [
        os.path.basename(markers[0])]
    assert open(left[0]).read() == kept_content
    assert spark.read.parquet(vec).count() == n_total - n_lost

    # the replay: the lost batch re-runs and re-publishes exactly once
    uncommit()
    drain("ckpt")
    after = spark.read.parquet(vec)
    assert after.count() == n_total
    assert after.select("vec_id").distinct().count() == n_total
    assert lost in {os.path.basename(m) for m in
                    glob.glob(f"{index}/_append_batches/*.done")}


def test_retrain_heals_crashed_fallback_swap(
        spark, embs, tmp_path, monkeypatch):
    """Crash between the fallback swap's two renames leaves the live
    path missing and the old tree at ._retrain_old; the next invocation
    restores it before rebuilding (no data loss, correct final state)."""
    from garmadon_spark.sinks import archive as _arch

    path = str(tmp_path / "idx")
    similarity.write_ivf_index(embs, path, n_centroids=8, iterations=1)
    n_rows = spark.read.parquet(f"{path}/vectors").count()

    calls = {"n": 0}
    real_rename = os.rename

    def crashing_rename(a, b):
        real_rename(a, b)
        calls["n"] += 1
        if b.endswith("._retrain_old"):
            raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(
        "garmadon_spark.sinks.archive._exchange_dirs", lambda a, b: False
    )
    monkeypatch.setattr("os.rename", crashing_rename)
    with pytest.raises(RuntimeError):
        similarity.retrain_ivf_index(spark, path, n_centroids=8)
    monkeypatch.setattr("os.rename", real_rename)
    assert not os.path.isdir(path)          # the crash window
    assert os.path.isdir(path + "._retrain_old")

    cents = similarity.retrain_ivf_index(spark, path, n_centroids=8)
    assert len(cents) == 8
    assert spark.read.parquet(f"{path}/vectors").count() == n_rows
    assert not os.path.isdir(path + "._retrain_old")
    assert not os.path.isdir(path + "._retrain")


def test_retrain_keeps_cell_count_when_unspecified(spark, embs, tmp_path):
    """n_centroids=None re-fits the quantizer at the CURRENT cell count."""
    path = str(tmp_path / "idx")
    similarity.write_ivf_index(embs, path, n_centroids=8, iterations=1)
    cents = similarity.retrain_ivf_index(spark, path)
    assert len(cents) == 8
    assert spark.read.parquet(f"{path}/centroids").count() == 8


def test_lifecycle_queries_contract(spark):
    """Declared-surface smoke at sf0.001: the recall-vs-nprobe curve
    covers both cohorts per stage at every measured width, recalls in
    [0,1], and the lifecycle check is all-true (the floors the oracle
    pins at sf0.01)."""
    from garmadon_spark.queries import datapipe as dp

    sf = "/root/testdata/sf0.001"
    rec = {(r.stage, r.cohort, r.nprobe): r for r in
           dp.emb_ann_recall(spark, sf).collect()}
    ret = {(r.stage, r.cohort, r.nprobe): r for r in
           dp.emb_ann_retrain(spark, sf).collect()}
    assert {(s, c) for s, c, _ in rec} == {
        ("appended", "base"), ("appended", "drifted")}
    assert {(s, c) for s, c, _ in ret} == {
        ("retrained", "base"), ("retrained", "drifted")}
    # same width set for every cohort within a stage, and the all-cells
    # anchor keeps every stage a curve (≥2 widths) even at the fixture's
    # tiny cell counts where the three fractions collapse to one
    for d in (rec, ret):
        widths = {}
        for s, c, np_ in d:
            widths.setdefault(c, set()).add(np_)
        assert len(set(map(frozenset, widths.values()))) == 1
        assert all(len(w) >= 2 for w in widths.values()), widths
    for r in list(rec.values()) + list(ret.values()):
        assert 0.0 <= r.recall <= 1.0
        assert r.nprobe <= r.cells
        if r.nprobe == r.cells:       # the anchor row is exact-vs-exact
            assert r.recall == 1.0, r
    row = dp.emb_ann_lifecycle_check(spark, sf).head()
    assert all(list(row.asDict().values())), row.asDict()


def test_retrain_hierarchical_index_drops_stale_routing(
        spark, embs, tmp_path, monkeypatch):
    """A hierarchical build persists ivf_branch INSIDE the vector data
    files; re-training such an index into another hierarchical layout
    must drop the stale routing columns instead of colliding with the
    new build's own (AMBIGUOUS_REFERENCE — caught by the 100× sweep,
    where 2n crosses HIER_IVF_MIN_CELLS)."""
    path = str(tmp_path / "idx")
    similarity.write_ivf_index(
        embs, path, n_centroids=9, iterations=1, hierarchical=True,
    )
    vec_cols = spark.read.parquet(f"{path}/vectors").columns
    assert vec_cols.count("ivf_branch") == 1  # the hierarchical layout
    n_rows = spark.read.parquet(f"{path}/vectors").count()

    # force the REBUILD down the hierarchical path at fixture scale
    monkeypatch.setattr(similarity, "HIER_IVF_MIN_CELLS", 4)
    cents = similarity.retrain_ivf_index(spark, path, n_centroids=9)
    assert len(cents) == 9
    after = spark.read.parquet(f"{path}/vectors")
    assert after.count() == n_rows
    assert after.columns.count("ivf_branch") == 1
    assert os.path.isdir(f"{path}/coarse")
    # flat retrain over the hierarchical tree also works (branch col
    # dropped, coarse side table removed by the flat build)
    monkeypatch.setattr(similarity, "HIER_IVF_MIN_CELLS", 256)
    cents2 = similarity.retrain_ivf_index(spark, path, n_centroids=8)
    assert len(cents2) == 8
    after2 = spark.read.parquet(f"{path}/vectors")
    assert after2.count() == n_rows
    assert "ivf_branch" not in after2.columns
    assert not os.path.isdir(f"{path}/coarse")


def test_recall_curve_three_widths_monotone(spark, embs, tmp_path):
    """On an index with enough cells the telemetry emits the full
    three-width recall-vs-nprobe curve, and recall is NON-DECREASING in
    nprobe: cell selection ranks cells once and takes prefixes (nested
    candidate sets), and top-k under the shared total order (rounded
    cosine desc, id asc) makes |topk(S) ∩ topk(U)| monotone in S."""
    from garmadon_spark.queries.datapipe import _recall_df

    n = embs.count()
    path = str(tmp_path / "idx")
    similarity.write_ivf_index(embs, path, n_centroids=64, iterations=1)
    similarity.append_to_ivf_index(_drifted(embs, n), path)
    rows = _recall_df(spark, path, n, stage="appended").collect()
    widths = sorted({r.nprobe for r in rows})
    # cells/8, cells/4, cells/2 + the all-cells anchor
    assert widths == [8, 16, 32, 64]
    for cohort in ("base", "drifted"):
        curve = [r.recall for r in
                 sorted((x for x in rows if x.cohort == cohort),
                        key=lambda r: r.nprobe)]
        assert len(curve) == 4
        assert curve == sorted(curve), (cohort, curve)
        assert curve[-1] == 1.0           # the anchor is exact-vs-exact


def test_widest_recall_rows_anchor_fallback(spark):
    """The lifecycle floors gate on the widest NON-anchor width via the
    single shared anchor definition (is_anchor_recall_row).  Anchor
    rows never win over a measured width; when a cohort's curve is ALL
    anchors (cell count collapsed to the probe floor), the widest
    anchor is returned instead of raising KeyError (r10 advisor)."""
    from garmadon_spark.queries import datapipe as dp

    assert dp.is_anchor_recall_row(8, 8) and dp.is_anchor_recall_row(9, 8)
    assert not dp.is_anchor_recall_row(4, 8)

    schema = ("stage string, cohort string, n_queries int, k int,"
              " nprobe int, cells int, recall double")
    mixed = spark.createDataFrame(
        [("s", "base", 1, 1, 4, 8, 0.7),
         ("s", "base", 1, 1, 8, 8, 1.0),       # anchor must not win
         ("s", "drifted", 1, 1, 4, 4, 1.0),    # all-anchor cohort
         ("s", "drifted", 1, 1, 6, 4, 1.0)],
        schema,
    )
    got = dp._widest_recall_rows(mixed)
    assert got["base"] == 0.7                  # not the vacuous 1.0
    assert got["drifted"] == 1.0               # fallback, no KeyError
