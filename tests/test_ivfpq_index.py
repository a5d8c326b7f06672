"""Persisted IVF-PQ index: learned OPQ rotation (descent guarantee),
layout, probes, appends, streaming maintenance, and the blue/green
re-train that refits the WHOLE quantizer stack (coarse + rotation +
codebooks).  Reference contract mirrored by the swap:
ProtoParquetWriterWithOffset.java:82-135 (temp→final commit); the OPQ
algorithm is Ge et al., CVPR 2013 (non-parametric OPQ)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import similarity
from garmadon_spark.session import load_table


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_fit_opq_descent_and_orthonormality(spark, embs):
    """The alternation is a true descent from the PCA init (warm-started
    codebooks + exact Procrustes rotation), and the learned rotation
    stays orthonormal — the property that makes rotated-space cosine
    equal raw cosine."""
    R, books, errs = fit = similarity.fit_opq(
        embs, m=16, ksub=16, iterations=3, opq_iterations=4
    )
    assert len(fit) == 3
    for a, b in zip(errs, errs[1:]):
        assert b <= a + 1e-12, errs
    assert errs[-1] <= errs[0]
    Rm = np.asarray(R)
    assert Rm.shape == (64, 64)
    assert np.allclose(Rm @ Rm.T, np.eye(64), atol=1e-9)
    assert len(books) == 16 and len(books[0]) == 16
    assert len(books[0][0]) == 4          # dsub = 64/16


def test_opq_error_under_raw_on_fixture(spark, embs):
    """Corpus-wide quantization error: the learned rotation lands under
    raw-space PQ on the repo fixture (measured ~15 % — the whole point
    of the rotation; pca-vs-raw alone is NOT asserted because the
    fixture is near-isotropic and that ordering is data-dependent)."""
    R, opq_books, errs = similarity.fit_opq(
        embs, m=16, ksub=16, iterations=3, opq_iterations=4
    )
    raw_books = similarity.train_pq(embs, m=16, ksub=16, iterations=3)
    raw = similarity.pq_quantization_error(embs, raw_books).head()
    opq = similarity.pq_quantization_error(
        embs, opq_books, rotation=R
    ).head()
    assert raw.n == opq.n == embs.count()
    assert opq.mse < raw.mse, (opq.mse, raw.mse)
    # the corpus == the training sample at fixture scale, so the
    # corpus-wide error is exactly the final descent value
    assert abs(opq.mse - errs[-1]) < 1e-9


def test_write_ivfpq_index_layout_and_exact_rerank(spark, embs, tmp_path):
    """Layout contract + end-to-end parity: an all-cells probe with a
    corpus-sized rerank must reproduce brute-force cosine top-k on the
    RAW vectors exactly — the orthonormal-rotation-preserves-cosine
    property, end to end through the persisted tree."""
    path = str(tmp_path / "idx")
    cents, books = similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    assert len(cents) == 8
    for sub in ("centroids", "vectors", "rotation", "codebooks", "codes"):
        assert os.path.isdir(f"{path}/{sub}"), sub
    n = embs.count()
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == n
    assert codes.select("vec_id").distinct().count() == n

    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 3).head()["embedding"]]
    exact = similarity.brute_force_topk(
        embs.filter(F.col("vec_id") != 3), q, k=5
    ).collect()
    got = similarity.ivfpq_topk_from_index(
        spark, path, q, k=5, nprobe=8, rerank=n, exclude_ids=[3]
    ).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in exact]
    for g, e in zip(got, exact):
        assert abs(g.cosine - e.cosine) < 1e-5


def test_ivfpq_adc_probe_recall(spark, embs, tmp_path):
    """The pruned probe at the serving shape emb_ann_ivfpq uses — half
    the cells, rerank 4·k — holds the same ≥0.6 recall floor the
    in-memory emb_ann_ivfpq_check pins, through the persisted tree."""
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = {r.vec_id for r in similarity.brute_force_topk(
        embs.filter(F.col("vec_id") != 0), q, k=10).collect()}
    got = {r.vec_id for r in similarity.ivfpq_topk_from_index(
        spark, path, q, k=10, nprobe=4, rerank=40, exclude_ids=[0]
    ).collect()}
    assert len(got & exact) / len(exact) >= 0.6


def test_append_to_ivfpq_index_keeps_trees_consistent(
        spark, embs, tmp_path):
    """A batch append lands BOTH vectors and codes with identical cell
    routing (codes encoded from the same staged assignment), and the
    probe sees the new rows."""
    n = embs.count()
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    newbie = embs.select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding", "label"
    ).limit(40)
    similarity.append_to_ivfpq_index(newbie, path)
    vecs = spark.read.parquet(f"{path}/vectors")
    codes = spark.read.parquet(f"{path}/codes")
    assert vecs.count() == codes.count() == n + 40
    vcells = {(r.vec_id, r.ivf_cell) for r in
              vecs.select("vec_id", "ivf_cell").collect()}
    ccells = {(r.vec_id, r.ivf_cell) for r in
              codes.select("vec_id", "ivf_cell").collect()}
    assert vcells == ccells
    # the appended twin of vector 0 is findable
    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 0).head()["embedding"]]
    got = similarity.ivfpq_topk_from_index(
        spark, path, q, k=3, nprobe=8, rerank=50
    ).collect()
    assert {r.vec_id for r in got} >= {0, n}


def _drain_pq(spark, src, index, ckpt):
    from garmadon_spark.streaming import ann

    q = ann.maintain_ivfpq_index_stream(
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        index, ckpt,
    ).start()
    q.awaitTermination()


def test_maintain_ivfpq_stream_exactly_once(spark, embs, tmp_path):
    """Streaming maintenance publishes vectors AND codes under b{N}-*
    names exactly once: a marker replay is a no-op, and a crash between
    publish and marker replays to the identical file set (no duplicate
    ids in either tree)."""
    n = embs.count()
    index = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs.filter(F.col("vec_id") % 2 == 0), index,
        n_centroids=4, m=16, ksub=16, iterations=1, pq_iterations=3,
        opq=True,
    )
    src = str(tmp_path / "new_vectors")
    new = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    new.filter(F.col("vec_id") % 4 == 1).write.mode("append").parquet(src)
    new.filter(F.col("vec_id") % 4 == 3).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    _drain_pq(spark, src, index, ckpt)

    vecs = spark.read.parquet(f"{index}/vectors")
    codes = spark.read.parquet(f"{index}/codes")
    assert vecs.count() == codes.count() == n
    assert codes.select("vec_id").distinct().count() == n
    assert glob.glob(f"{index}/vectors/ivf_cell=*/b1-*.parquet")
    assert glob.glob(f"{index}/codes/ivf_cell=*/b1-*.parquet")

    # crash between publish and marker: lose the last marker, uncommit,
    # replay -> converges (frozen quantizers => identical regeneration)
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    os.remove(markers[-1])
    commits = f"{ckpt}/commits"
    last = sorted(f for f in os.listdir(commits) if f.isdigit())[-1]
    os.remove(f"{commits}/{last}")
    try:
        os.remove(f"{commits}/.{last}.crc")
    except FileNotFoundError:
        pass
    _drain_pq(spark, src, index, ckpt)
    for tree in ("vectors", "codes"):
        df = spark.read.parquet(f"{index}/{tree}")
        assert df.count() == n, tree
        assert df.select("vec_id").distinct().count() == n, tree


def test_retrain_ivfpq_refits_whole_stack(spark, embs, tmp_path):
    """Blue/green IVF-PQ re-train: row set preserved in BOTH trees,
    codes re-encoded against the NEW quantizers (probe parity gate),
    committed markers carried WITH content, rotation refit composes
    (still orthonormal), no staging debris."""
    n = embs.count()
    index = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs.filter(F.col("vec_id") % 2 == 0), index,
        n_centroids=4, m=16, ksub=16, iterations=1, pq_iterations=3,
        opq=True,
    )
    src = str(tmp_path / "new_vectors")
    new = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    new.write.mode("append").parquet(src)
    _drain_pq(spark, src, index, str(tmp_path / "ckpt"))
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert len(markers) == 1
    content = open(markers[0]).read()
    assert content.startswith("done:")
    R_old = np.asarray(similarity.load_opq_rotation(spark, index))

    cents, books = similarity.retrain_ivfpq_index(
        spark, index, n_centroids=8, iterations=1, pq_iterations=3,
    )
    assert len(cents) == 8
    for tree in ("vectors", "codes"):
        df = spark.read.parquet(f"{index}/{tree}")
        assert df.count() == n, tree
        assert df.select("vec_id").distinct().count() == n, tree
        # rebuilt trees carry no per-batch files — codes were re-encoded
        assert not glob.glob(f"{index}/{tree}/ivf_cell=*/b*-*.parquet")
    left = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert [os.path.basename(m) for m in left] == [
        os.path.basename(markers[0])]
    assert open(left[0]).read() == content
    R_new = np.asarray(similarity.load_opq_rotation(spark, index))
    assert R_new.shape == R_old.shape
    assert np.allclose(R_new @ R_new.T, np.eye(len(R_new)), atol=1e-9)
    assert not np.allclose(R_new, R_old)      # the refit composed
    assert not os.path.isdir(index + "._retrain")
    assert not os.path.isdir(index + "._retrain_old")
    # post-retrain probe parity: all-cells + full rerank == brute force
    q = [float(x) for x in
         embs.filter(F.col("vec_id") == 3).head()["embedding"]]
    exact = similarity.brute_force_topk(
        embs.filter(F.col("vec_id") != 3), q, k=5).collect()
    got = similarity.ivfpq_topk_from_index(
        spark, index, q, k=5, nprobe=8, rerank=n, exclude_ids=[3]
    ).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in exact]


def test_retrain_ivfpq_excludes_unmarked(spark, embs, tmp_path):
    """The crash window, PQ edition: the final batch published vectors
    AND codes but lost its marker — the retrain excludes those rows
    from the rebuilt corpus (both trees), and the replay re-publishes
    them exactly once."""
    n = embs.count()
    index = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs.filter(F.col("vec_id") % 2 == 0), index,
        n_centroids=4, m=16, ksub=16, iterations=1, pq_iterations=3,
        opq=True,
    )
    src = str(tmp_path / "new_vectors")
    new = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    new.filter(F.col("vec_id") % 4 == 1).write.mode("append").parquet(src)
    new.filter(F.col("vec_id") % 4 == 3).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    _drain_pq(spark, src, index, ckpt)
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert len(markers) == 2
    os.remove(markers[1])
    n_lost = new.filter(F.col("vec_id") % 4 == 3).count()

    similarity.retrain_ivfpq_index(
        spark, index, n_centroids=8, iterations=1, pq_iterations=3,
    )
    for tree in ("vectors", "codes"):
        assert (spark.read.parquet(f"{index}/{tree}").count()
                == n - n_lost), tree

    commits = f"{ckpt}/commits"
    last = sorted(f for f in os.listdir(commits) if f.isdigit())[-1]
    os.remove(f"{commits}/{last}")
    try:
        os.remove(f"{commits}/.{last}.crc")
    except FileNotFoundError:
        pass
    _drain_pq(spark, src, index, ckpt)
    for tree in ("vectors", "codes"):
        df = spark.read.parquet(f"{index}/{tree}")
        assert df.count() == n, tree
        assert df.select("vec_id").distinct().count() == n, tree


def test_compact_codes_subtree(spark, embs, tmp_path):
    """compact_ivf_index(subtree='codes') folds a fragmented codes tree
    exactly like the vectors tree: same rows, fewer files."""
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=4, m=16, ksub=16, iterations=1,
        pq_iterations=3,
    )
    n = embs.count()
    for i in range(2):
        batch = embs.select(
            (F.col("vec_id") + n * (i + 1)).alias("vec_id"),
            "embedding", "label",
        ).limit(30)
        similarity.append_to_ivfpq_index(batch, path)
    codes = f"{path}/codes"
    before_rows = spark.read.parquet(codes).count()
    before_files = len(glob.glob(f"{codes}/ivf_cell=*/*.parquet"))
    done = similarity.compact_ivf_index(spark, path, subtree="codes")
    assert done
    after_files = len(glob.glob(f"{codes}/ivf_cell=*/*.parquet"))
    assert after_files < before_files
    assert spark.read.parquet(codes).count() == before_rows


def test_opq_and_ivfpq_queries_contract(spark):
    """Declared-surface smoke at sf0.001: the OPQ gate booleans are
    all-true (the floors the oracle pins at sf0.01), the telemetry
    rows cover both cohorts per stage, and the descent rows are
    non-increasing."""
    from garmadon_spark.queries import datapipe as dp

    sf = "/root/testdata/sf0.001"
    tel = dp.emb_opq(spark, sf).collect()
    descent = [r.mse for r in sorted(
        (r for r in tel if r.variant == "train_descent"),
        key=lambda r: r.iter)]
    assert len(descent) >= 2
    assert descent == sorted(descent, reverse=True) or all(
        b <= a + 1e-12 for a, b in zip(descent, descent[1:]))
    assert {r.variant for r in tel} == {
        "corpus_raw", "corpus_opq", "train_descent"}
    row = dp.emb_opq_check(spark, sf).head()
    assert all(row.asDict().values()), row.asDict()

    rec = {(r.stage, r.cohort): r for r in
           dp.emb_ivfpq_retrain(spark, sf).collect()}
    assert set(rec) == {("appended", "base"), ("appended", "drifted"),
                        ("retrained", "base"), ("retrained", "drifted")}
    for r in rec.values():
        assert 0.0 <= r.recall <= 1.0
    row = dp.emb_ivfpq_lifecycle_check(spark, sf).head()
    assert all(row.asDict().values()), row.asDict()

    # the served-ANN pair: k rows per query from the streamed results,
    # and the exact stream==batch gate holds
    served = dp.emb_ivfpq_serve(spark, sf).collect()
    assert len(served) == dp._SERVE_QUERIES * dp._RECALL_K
    assert {r.query_id for r in served} == set(range(dp._SERVE_QUERIES))
    row = dp.emb_ivfpq_serve_check(spark, sf).head()
    assert all(row.asDict().values()), row.asDict()


def test_ivfpq_batch_matches_single(spark, embs, tmp_path):
    """The batched ADC probe reproduces the single-query probe exactly
    for each query in the batch — shared cell-selection arithmetic
    (_probe_cells_udf / _top_ids_np) plus identical ADC decomposition
    and tie-breaks, the same parity contract ivf_topk_batch carries."""
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    qids = [0, 7, 42]
    queries = embs.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for rerank in (0, 20):
        batch = similarity.ivfpq_topk_batch(
            spark, path, queries, k=5, nprobe=4, rerank=rerank,
        )
        got = {}
        for r in batch.collect():
            got.setdefault(r.query_id, []).append(
                (r.rank, r.vec_id, r[2]))
        batch._gs_unpersist()
        for qid in qids:
            q = [float(x) for x in
                 embs.filter(F.col("vec_id") == qid).head()["embedding"]]
            single = similarity.ivfpq_topk_from_index(
                spark, path, q, k=5, nprobe=4, rerank=rerank,
                exclude_ids=[qid],
            ).collect()
            want = [(i + 1, r.vec_id, r[1]) for i, r in enumerate(single)]
            assert sorted(got[qid]) == want, (qid, rerank)


def test_ivfpq_hierarchical_batch_matches_single(spark, embs, tmp_path,
                                                 monkeypatch):
    """The parity contract holds through a HIERARCHICAL IVF-PQ index
    too: the single-query probe routes two-level with the same branch
    budget as the batch UDF (the review found it probing all fine
    centroids flat, which diverged past HIER_IVF_MIN_CELLS)."""
    monkeypatch.setattr(similarity, "HIER_IVF_MIN_CELLS", 4)
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=9, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    assert os.path.isdir(f"{path}/coarse")
    qids = [0, 13, 77]
    queries = embs.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = similarity.ivfpq_topk_batch(
        spark, path, queries, k=5, nprobe=3, rerank=20,
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r[2]))
    batch._gs_unpersist()
    for qid in qids:
        q = [float(x) for x in
             embs.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = similarity.ivfpq_topk_from_index(
            spark, path, q, k=5, nprobe=3, rerank=20, exclude_ids=[qid],
        ).collect()
        want = [(i + 1, r.vec_id, r[1]) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want, qid


def test_sync_ivfpq_codes_heals_crash_window(spark, embs, tmp_path):
    """A direct append that died between the vectors write and the
    codes write leaves the trees diverged; sync_ivfpq_codes re-encodes
    exactly the missing rows (frozen codebooks), is idempotent, and
    the probe then sees the healed rows on the ADC path."""
    n = embs.count()
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    # simulate the window: append vectors WITHOUT codes
    newbie = embs.select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding", "label"
    ).limit(30)
    rotation = similarity.load_opq_rotation(spark, path)
    prep = similarity._rotate_normalize(
        newbie.drop("ivf_cell", "ivf_branch"), rotation, "embedding"
    )
    similarity.append_to_ivf_index(prep, path)
    assert (spark.read.parquet(f"{path}/vectors").count()
            - spark.read.parquet(f"{path}/codes").count()) == 30

    healed = similarity.sync_ivfpq_codes(spark, path)
    assert healed == 30
    vecs = spark.read.parquet(f"{path}/vectors")
    codes = spark.read.parquet(f"{path}/codes")
    assert vecs.count() == codes.count() == n + 30
    vcells = {(r.vec_id, r.ivf_cell) for r in
              vecs.select("vec_id", "ivf_cell").collect()}
    ccells = {(r.vec_id, r.ivf_cell) for r in
              codes.select("vec_id", "ivf_cell").collect()}
    assert vcells == ccells
    assert similarity.sync_ivfpq_codes(spark, path) == 0  # idempotent


def test_ivfpq_batch_accepts_string_query_ids(spark, embs, tmp_path):
    """The batched ADC probe must accept ANY query-id type like its
    twin ivf_topk_batch — the r9 advisor found the LUT position map
    int64-casting query ids, so string/UUID ids crashed.  Same index,
    same vectors: results under string ids must be the int-id results
    modulo the id relabeling, on both the ADC and rerank paths."""
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    qids = [0, 7, 42]
    int_q = embs.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    str_q = int_q.select(
        F.concat(F.lit("q-"), F.col("query_id")).alias("query_id"),
        "embedding",
    )
    for rerank in (0, 20):
        a = similarity.ivfpq_topk_batch(
            spark, path, int_q, k=5, nprobe=4, rerank=rerank,
            exclude_self=False,
        )
        want = {(f"q-{r.query_id}", r.rank, r.vec_id, r[2])
                for r in a.collect()}
        a._gs_unpersist()
        b = similarity.ivfpq_topk_batch(
            spark, path, str_q, k=5, nprobe=4, rerank=rerank,
            exclude_self=False,
        )
        got = {(r.query_id, r.rank, r.vec_id, r[2])
               for r in b.collect()}
        b._gs_unpersist()
        assert got == want and len({q for q, *_ in got}) == 3

        # exclude_self=True with string ids vs a bigint corpus: the r10
        # advisor found the self-exclusion filter ANSI-casting the
        # string id to bigint and throwing on executors.  An external
        # id space shares no ids with the corpus, so exclusion must be
        # a no-op — same rows as exclude_self=False, and no crash.
        c = similarity.ivfpq_topk_batch(
            spark, path, str_q, k=5, nprobe=4, rerank=rerank,
            exclude_self=True,
        )
        got_excl = {(r.query_id, r.rank, r.vec_id, r[2])
                    for r in c.collect()}
        c._gs_unpersist()
        assert got_excl == got


def test_ivfpq_batch_preloaded_quantizer_parity(spark, embs, tmp_path):
    """ivfpq_topk_batch(..., quantizer=load_ivfpq_quantizer(...))
    equals the default self-load path on both the ADC and rerank paths
    — pins the tuple ORDER contract (fine_rows, coarse_by_id, books,
    rotation) the streaming server's generation-checked cache depends
    on; a silent reorder in load_ivfpq_quantizer would break every
    external quantizer= caller."""
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    queries = embs.filter(F.col("vec_id").isin([0, 7, 42])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    quant = similarity.load_ivfpq_quantizer(spark, path)
    assert quant[3] is not None          # OPQ index carries a rotation
    for rerank in (0, 20):
        a = similarity.ivfpq_topk_batch(
            spark, path, queries, k=5, nprobe=4, rerank=rerank,
        )
        want = {(r.query_id, r.rank, r.vec_id, r[2])
                for r in a.collect()}
        a._gs_unpersist()
        b = similarity.ivfpq_topk_batch(
            spark, path, queries, k=5, nprobe=4, rerank=rerank,
            quantizer=quant,
        )
        got = {(r.query_id, r.rank, r.vec_id, r[2])
               for r in b.collect()}
        b._gs_unpersist()
        assert got == want and len({q for q, *_ in got}) == 3


def test_compact_codes_skips_unmarked_append_then_replay_no_dupes(
        spark, embs, tmp_path):
    """The duplicate window of the vectors tree, replayed over the
    CODES subtree: a maintain_ivfpq_index_stream batch crashes BETWEEN
    publish and marker, and compact_ivf_index(subtree='codes') runs
    before the replay.  Compaction must skip cells holding the unmarked
    batch's b{N}-* files in the codes tree too — otherwise the replay's
    stale-file delete finds nothing there and the re-publish duplicates
    every code row while the vectors tree stays clean (diverged trees,
    the worst failure mode for ADC serving)."""
    index = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs.filter(F.col("vec_id") % 2 == 0), index,
        n_centroids=4, m=16, ksub=16, iterations=1, pq_iterations=3,
        opq=True,
    )
    src = str(tmp_path / "new_vectors")
    new = embs.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding"
    )
    new.filter(F.col("vec_id") % 4 == 1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    _drain_pq(spark, src, index, ckpt)
    n_total = embs.count()

    # crash window: batch 0 published to BOTH trees, marker lost, and
    # the checkpoint never committed the batch (same-checkpoint replay)
    markers = sorted(glob.glob(f"{index}/_append_batches/*.done"))
    assert len(markers) == 1
    os.remove(markers[0])
    for f in os.listdir(f"{ckpt}/commits"):
        os.remove(f"{ckpt}/commits/{f}")
    bid = os.path.basename(markers[0])[: -len(".done")]
    codes = f"{index}/codes"
    dirty = {
        d for d in os.listdir(codes)
        if glob.glob(os.path.join(codes, d, f"b{bid}-*.parquet"))
    }
    assert dirty

    compacted = similarity.compact_ivf_index(spark, index,
                                             subtree="codes")
    # unmarked-batch cells skipped; their b{N} files still in place
    assert all(f"ivf_cell={c}" not in dirty for c in compacted)
    for d in dirty:
        assert glob.glob(os.path.join(codes, d, f"b{bid}-*.parquet"))

    # the resumed checkpoint replays batch 0 (re-publish converges in
    # both trees) and absorbs a second file — zero duplicate vec_ids
    new.filter(F.col("vec_id") % 4 == 3).write.mode("append").parquet(src)
    _drain_pq(spark, src, index, ckpt)
    for tree in ("vectors", "codes"):
        df = spark.read.parquet(f"{index}/{tree}")
        assert df.count() == n_total, tree
        assert df.select("vec_id").distinct().count() == n_total, tree

    # with every marker back, compaction folds BOTH subtrees and
    # preserves each tree's row set exactly, still cell-consistent
    similarity.compact_ivf_index(spark, index, subtree="codes")
    similarity.compact_ivf_index(spark, index, subtree="vectors")
    vcells = {(r.vec_id, r.ivf_cell) for r in
              spark.read.parquet(f"{index}/vectors")
              .select("vec_id", "ivf_cell").collect()}
    ccells = {(r.vec_id, r.ivf_cell) for r in
              spark.read.parquet(f"{index}/codes")
              .select("vec_id", "ivf_cell").collect()}
    assert vcells == ccells and len(vcells) == n_total


def test_ivf_index_health_report(spark, embs, tmp_path):
    """ivf_index_health reads the on-disk artifact itself: healthy
    trees report zero divergence, a vectors-without-codes crash window
    surfaces as missing_codes (and drains after sync_ivfpq_codes), a
    lost maintain-stream marker surfaces as unmarked_batches, and a
    plain IVF index carries NULL code-tree columns."""
    from garmadon_spark.streaming import ann

    n = embs.count()
    path = str(tmp_path / "idx")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=3, opq=True,
    )
    h = similarity.ivf_index_health(spark, path).head()
    assert h.vectors_rows == h.codes_rows == n
    assert h.cells == 8 and h.populated_cells <= 8
    assert h.missing_codes == 0 and h.orphan_codes == 0
    assert h.unmarked_batches == 0
    assert h.vector_bytes > h.code_bytes > 0
    assert h.max_cell_rows >= h.avg_cell_rows > 0

    # divergence window: vectors appended without codes
    newbie = embs.select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding", "label"
    ).limit(30)
    rotation = similarity.load_opq_rotation(spark, path)
    prep = similarity._rotate_normalize(
        newbie.drop("ivf_cell", "ivf_branch"), rotation, "embedding"
    )
    similarity.append_to_ivf_index(prep, path)
    h2 = similarity.ivf_index_health(spark, path).head()
    assert h2.vectors_rows == n + 30 and h2.missing_codes == 30
    assert h2.orphan_codes == 0
    similarity.sync_ivfpq_codes(spark, path)
    h3 = similarity.ivf_index_health(spark, path).head()
    assert h3.missing_codes == 0 and h3.codes_rows == n + 30

    # a maintain-stream batch whose marker is lost → unmarked_batches
    src = str(tmp_path / "newer")
    embs.select((F.col("vec_id") + 10 * n).alias("vec_id"),
                "embedding").limit(10).write.parquet(src)
    q = ann.maintain_ivfpq_index_stream(
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src), path, str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination()
    assert similarity.ivf_index_health(spark, path) \
        .head().unmarked_batches == 0
    marker = glob.glob(f"{path}/_append_batches/*.done")[0]
    os.remove(marker)
    h4 = similarity.ivf_index_health(spark, path).head()
    assert h4.unmarked_batches == 1
    # appends fragment cells: more than one file somewhere by now
    assert h4.vector_max_files_per_cell > 1

    # plain IVF: no codes tree → NULL code columns, zero unmarked
    flat = str(tmp_path / "flat")
    similarity.write_ivf_index(embs, flat, n_centroids=8, iterations=1)
    hf = similarity.ivf_index_health(spark, flat).head()
    assert hf.codes_rows is None and hf.missing_codes is None
    assert hf.code_files is None and hf.unmarked_batches == 0


def test_ivfpq_filtered_probe_restricts_both_paths(spark, tmp_path):
    """allowed= on the IVF-PQ probe: pure-ADC and reranked results both
    contain ONLY permitted ids, the reranked filtered result equals
    brute-force filtered top-k at full width (ADC shortlist wide enough
    to be exhaustive), and k survivors are returned — the filter
    applies before scoring, not as a post-filter."""
    from garmadon_spark.session import load_table

    embs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "pq")
    similarity.write_ivfpq_index(
        embs, path, n_centroids=8, m=16, ksub=16, iterations=1,
        pq_iterations=2, opq=True,
    )
    allowed = embs.filter(F.col("label") % 3 == 0).select("vec_id")
    ok = {r.vec_id for r in allowed.collect()}
    queries = embs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = similarity.ivfpq_topk_batch(
        spark, path, queries, k=5, nprobe=8, exclude_self=True,
        allowed=allowed,
    )
    rows = adc.collect()
    adc._gs_unpersist()
    assert rows and all(r.vec_id in ok for r in rows)
    n = embs.count()
    rr = similarity.ivfpq_topk_batch(
        spark, path, queries, k=5, nprobe=8, rerank=n,
        exclude_self=True, allowed=allowed,
    )
    got = {qid: {r.vec_id for r in rr.collect() if r.query_id == qid}
           for qid in (0, 1)}
    rr._gs_unpersist()
    for qid in (0, 1):
        assert got[qid] <= ok and len(got[qid]) == 5
        qv = [float(x) for x in embs.filter(
            F.col("vec_id") == qid).head()["embedding"]]
        bf = similarity.brute_force_topk(
            embs.filter((F.col("label") % 3 == 0)
                        & (F.col("vec_id") != qid)),
            qv, k=5,
        )
        assert {r.vec_id for r in bf.collect()} == got[qid]
