"""Streaming ANN serving: probe a materialized IVF index with a stream
of query vectors.

The index side is the offline artifact (`similarity.write_ivf_index` —
cell-partitioned vectors + centroid side tables, absorbed daily via
`append_to_ivf_index`); the query side is a stream (an embedding
service's output topic, a re-ranking queue).  Each micro-batch probes
via `similarity.ivf_topk_batch`:

- the centroid matrix rides the executor closure — centroid-sized, not
  corpus-sized;
- the vector scan partition-prunes to the union of the batch's probed
  cells at planning time;
- the batch-sized query table broadcasts; the corpus never shuffles.

State: NONE (each batch is independent) — the operator needs no
watermark and restarts cleanly from the source offsets alone.
Exactly-once to the parquet result sink uses the same per-batch marker
protocol as the rollup sink (idempotent replay after a crash between
write and commit: a replayed batch that already has its marker is
skipped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmadon_spark.operators import similarity
from garmadon_spark.sinks.rollup import (
    _checkpoint_run_id,
    _marker_current,
    _marker_run_id,
    _refuse_foreign_chain,
    _write_marker,
)


def apply_results_retention(
    out_path: str, retain_batches: int, run_id: str | None = None
) -> list:
    """K2-style lifecycle for the serving results table: keep the
    newest ``retain_batches`` ``batch_id=`` partitions, delete older
    ones AND their ``_ann_batches`` markers together (a marker without
    its partition would claim results that no longer exist; a partition
    without its marker would re-materialize on a replay).  Old batches
    can never replay — the checkpoint committed past them when they
    completed, and retention keeps at least the current batch — so
    dropping their markers is safe.  Returns the pruned batch ids.

    Ordering: partitions belonging to a DEAD incarnation are dropped
    first — with ``run_id`` set (the live checkpoint's query id, which
    serve_ann_stream passes), any partition whose marker records a
    DIFFERENT run id, or has no marker at all (a crashed write the
    current run would rewrite anyway), is older-than-everything by
    definition, immune to mtime granularity.  Among the current run's
    partitions (and always, when ``run_id`` is None), "newest" is by
    WRITE TIME (partition mtime, id tie-break), not by batch id: a
    query restarted with a FRESH checkpoint over the same out_path
    re-numbers batches from 0, and id-ordered retention would delete
    the just-written batch 0 while retaining the previous incarnation's
    stale high-id partitions.  (A replayed batch rewrites its
    partition, refreshing the mtime — replays stay "newest".)

    Local-FS implementation like sinks.archive.apply_retention; on a
    cluster this is an ALTER TABLE DROP PARTITION / table-format
    VACUUM."""
    import os as _os
    import re as _re
    import shutil as _shutil

    if retain_batches < 1:
        raise ValueError("retain_batches must be >= 1")
    if not _os.path.isdir(out_path):
        return []
    stamped = []
    for d in _os.listdir(out_path):
        m = _re.fullmatch(r"batch_id=(\d+)", d)
        if not m:
            continue
        b = int(m.group(1))
        try:
            mt = _os.stat(_os.path.join(out_path, d)).st_mtime_ns
        except OSError:
            mt = 0
        current = 1
        if run_id is not None:
            try:
                content = open(
                    f"{out_path}/_ann_batches/{b}.done"
                ).read()
            except OSError:
                content = None
            if content is None:
                current = 0          # no marker: crashed/foreign write
            else:
                rec = _marker_run_id(content)
                if rec is not None and rec != run_id:
                    current = 0      # a dead incarnation's batch
        stamped.append((current, mt, b))
    stamped.sort()
    dropped = [b for _, _, b in stamped[: max(0, len(stamped)
                                              - retain_batches)]]
    for b in dropped:
        _shutil.rmtree(f"{out_path}/batch_id={b}", ignore_errors=True)
        try:
            _os.remove(f"{out_path}/_ann_batches/{b}.done")
        except FileNotFoundError:
            pass
    return sorted(dropped)


_IVF_GEN_SIDES = ("centroids", "coarse")
_IVFPQ_GEN_SIDES = ("centroids", "coarse", "codebooks", "rotation")


def _quantizer_generation(
    index_path: str, sides: tuple = _IVF_GEN_SIDES
) -> tuple:
    """Cheap identity of the index's quantizer: the mtimes of its
    side-table directories (``centroids``/``coarse`` for plain IVF;
    plus ``codebooks``/``rotation`` for IVF-PQ — one tuple, so the
    serving cache can never mix a new coarse layer with stale
    codebooks).  A blue/green re-train swaps the index ROOT, so every
    side resolves to a newly written directory (new mtimes); appends
    and cell compaction touch only ``vectors/``/``codes/`` and leave
    the generation unchanged.  ``gen[0] is None`` (no centroid table —
    the one side every layout requires) is the index-absent/mid-swap
    signal the serve loop retries on; an absent ``coarse`` (flat
    index) or ``rotation`` (unrotated index) is just None in its slot
    and compares stably."""
    import os as _os

    gen = []
    for side in sides:
        try:
            gen.append(_os.stat(f"{index_path}/{side}").st_mtime_ns)
        except OSError:
            gen.append(None)
    return tuple(gen)


def _serve_probe_loop(
    queries: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    retain_batches: int | None,
    sides: tuple,
    load_quantizer,
    probe,
    build_hint: str,
):
    """The serving loop shared by ``serve_ann_stream`` (plain IVF) and
    ``serve_ivfpq_stream`` (ADC over the codes tree).  Everything that
    is NOT the probe itself lives here once: run-scoped marker
    idempotence, the generation-checked quantizer cache
    (``_quantizer_generation`` over ``sides``), the bounded mid-swap
    retry, per-batch partition overwrite, and optional results
    retention.  ``load_quantizer(sess)`` loads the driver-sized
    quantizer unit; ``probe(sess, batch_df, quantizer)`` returns the
    batch's result DataFrame (must carry ``_gs_unpersist``)."""
    if retain_batches is not None and retain_batches < 1:
        # fail at wiring time, not inside the first foreachBatch
        raise ValueError("retain_batches must be >= 1")
    cache: dict = {}

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        sess = batch_df.sparkSession
        if "run" not in cache:
            # the checkpoint's query id: stable across restarts of the
            # SAME checkpoint, fresh for a new one — scopes the markers
            # so a fresh-checkpoint restart over the same out_path
            # RECOMPUTES colliding batch ids (idempotent per-partition
            # overwrite) instead of silently skipping them
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            # allow_foreign: serving batches are independent and
            # idempotently overwritten, so a dead incarnation's marker
            # is simply recomputed — only the unreadable-run-id case
            # must fail loud (own vs dead is indistinguishable)
            _refuse_foreign_chain(
                sess, f"{out_path}/_ann_batches", cache["run"],
                "clear the results path or fix the checkpoint before "
                "serving", allow_foreign=True,
            )
        run = cache["run"]
        marker = f"{out_path}/_ann_batches/{batch_id}.done"
        if _marker_current(sess, marker, run) or batch_df.isEmpty():
            return
        gen = _quantizer_generation(index_path, sides)
        # gen[0] is None: the centroid table (the one side every layout
        # requires) is ABSENT — the rename-pair fallback of a concurrent
        # re-train swap (no renameat2 on this filesystem) has a
        # sub-millisecond window between its two renames.  Bounded retry
        # instead of killing the query.
        if gen[0] is None:
            for _ in range(50):
                _time.sleep(0.1)
                gen = _quantizer_generation(index_path, sides)
                if gen[0] is not None:
                    break
            else:
                # still absent after the bounded retry: this is not the
                # swap window any more — name the real problem instead
                # of letting the quantizer load die on an opaque
                # path-not-found deep in the parquet reader
                raise RuntimeError(
                    f"ANN index absent or mid-swap at {index_path}: no "
                    "quantizer side tables after 5 s — build the index "
                    f"({build_hint}) or check the re-train job, then "
                    "restart serving from the same checkpoint"
                )
        if cache.get("gen") != gen:
            cache["quant"] = load_quantizer(sess)
            cache["gen"] = gen
        res = probe(sess, batch_df, cache["quant"])
        try:
            res.write.mode("overwrite").parquet(
                f"{out_path}/batch_id={batch_id}"
            )
        finally:
            res._gs_unpersist()
        _write_marker(sess, marker, run)
        if retain_batches is not None:
            apply_results_retention(out_path, retain_batches,
                                    run_id=run)

    return (
        queries.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def serve_ann_stream(
    queries: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = False,
    retain_batches: int | None = None,
    allowed: DataFrame | None = None,
):
    """Wire a query-vector stream to the IVF index; returns the
    (unstarted) ``DataStreamWriter``.  Results land in ``out_path`` as
    parquet rows (query_id, vec_id, cosine, rank, batch_id).

    ``allowed``: FILTERED serving — the ivf_topk_batch contract,
    applied to every micro-batch's probe: a one-column frame of
    permitted corpus ids (static filter), or a two-column
    (query_id, corpus_id) pair frame for PER-QUERY predicates
    (multi-tenant serving — each query's k results satisfy its own
    allowlist).  The plan re-evaluates per trigger, so a table-backed
    predicate tracks the table; pair rows for query ids not in a batch
    are simply never matched.

    ``exclude_self`` defaults False here (external queries own a
    separate id space); pass True when replaying corpus vectors as
    queries.  The returned writer is availableNow-triggered (drain
    what's available, then stop — the batch-job default shared with
    the rollup sink); a LONG-RUNNING server must opt into continuous
    micro-batching explicitly:
    ``serve_ann_stream(...).trigger(processingTime="10 seconds")``.

    Exactly-once mechanics: each batch's results land in their own
    ``batch_id=N`` partition with mode('overwrite') — a replayed batch
    that crashed between write and marker REWRITES the same partition
    instead of appending duplicates; the marker only short-circuits
    work.  Markers are RUN-SCOPED (they record the checkpoint's query
    id): a restart with a fresh checkpoint re-numbers batches from 0,
    and a dead incarnation's marker for a colliding id must not
    swallow the new batch — a foreign-run marker is treated as absent
    and the partition is recomputed (idempotent overwrite).  The quantizer (centroid tables) is loaded ON THE FIRST
    BATCH and reused across triggers — k·d·8 B of driver memory, not a
    per-trigger centroid-table scan (lazy so the writer can be
    constructed before the offline index build finishes).  The cache is
    GENERATION-CHECKED: each batch stats the quantizer side tables (two
    stat calls), so a blue/green re-train
    (similarity.retrain_ivf_index — atomic root swap) is picked up on
    the NEXT micro-batch without a restart; appends keep centroids
    fixed and never trigger a reload.  Remaining race, documented: a
    swap landing between a batch's generation check and its vector
    scan serves that one batch from the old quantizer against the new
    layout (degraded pruning for one trigger) — serialize re-trains
    with serving triggers where that matters.

    ``retain_batches``: a long-running server writes one ``batch_id=N``
    partition per micro-batch forever; pass a count to prune results
    older than the newest N batches (markers pruned together —
    ``apply_results_retention``) after each commit.  None (default)
    keeps everything — the batch-job semantics."""

    def probe(sess, batch_df: DataFrame, quantizer) -> DataFrame:
        return similarity.ivf_topk_batch(
            sess, index_path, batch_df, k=k, nprobe=nprobe,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            exclude_self=exclude_self, centroids=quantizer,
            allowed=allowed,
        )

    return _serve_probe_loop(
        queries, index_path, out_path, checkpoint, retain_batches,
        _IVF_GEN_SIDES,
        lambda sess: similarity.load_ivf_centroids(sess, index_path),
        probe, "write_ivf_index",
    )


def serve_ivfpq_stream(
    queries: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = False,
    retain_batches: int | None = None,
    allowed: DataFrame | None = None,
):
    """``serve_ann_stream``'s twin over a persisted IVF-PQ index
    (similarity.write_ivfpq_index): each micro-batch of query vectors
    probes the M-byte CODES tree via ``ivfpq_topk_batch`` — ADC scoring
    with the per-batch LUT tensor, the codes scan partition-pruned to
    the union of probed cells at planning time — instead of the
    4·D-byte vectors tree, so billion-scale serving reads
    (nprobe/K)·(M/4D) of what the raw-vector probe reads.  Results land
    in ``out_path`` as parquet rows (query_id, vec_id, cosine|adc,
    rank, batch_id).  Reference analogue: the dashboard serving loop
    (`ElasticSearchReader.java:230-279`) — a long-lived reader probing
    a maintained store per request batch.

    ``rerank``: shortlist size for the exact-cosine re-score from the
    vectors tree (broadcast point lookup, pruned to the same cells).
    Default None resolves to ``4·k`` — the corpus-fraction serving
    contract the declared ``emb_ann_ivfpq`` query pins; pass ``0`` to
    opt into pure-ADC results (columns then carry ``adc``, not
    ``cosine``).

    The quantizer cache holds the WHOLE stack as one unit
    (``load_ivfpq_quantizer``: fine/coarse centroids + residual
    codebooks + OPQ rotation — k·d + m·ksub·dsub + d² doubles of
    driver memory) and is generation-checked over ALL FOUR side tables
    (``_IVFPQ_GEN_SIDES``): a blue/green ``retrain_ivfpq_index`` swaps
    the root atomically, so the next micro-batch reloads everything
    together and can never mix a new coarse layer with stale codebooks;
    appends and codes compaction touch only ``vectors/``/``codes/`` and
    never trigger a reload.  Everything else — run-scoped marker
    idempotence, per-batch partition overwrite, the mid-swap bounded
    retry, ``retain_batches`` pruning, availableNow default trigger,
    the static ``allowed`` filter — is the shared serving loop,
    identical to ``serve_ann_stream``."""
    eff_rerank = 4 * k if rerank is None else rerank

    def probe(sess, batch_df: DataFrame, quantizer) -> DataFrame:
        return similarity.ivfpq_topk_batch(
            sess, index_path, batch_df, k=k, nprobe=nprobe,
            rerank=eff_rerank,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            exclude_self=exclude_self, quantizer=quantizer,
            allowed=allowed,
        )

    return _serve_probe_loop(
        queries, index_path, out_path, checkpoint, retain_batches,
        _IVFPQ_GEN_SIDES,
        lambda sess: similarity.load_ivfpq_quantizer(sess, index_path),
        probe, "write_ivfpq_index",
    )


def maintain_ann_index_stream(
    embs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The WRITE side of streaming ANN: absorb a stream of new
    embedding vectors into the materialized IVF index, exactly once.
    Serving (`serve_ann_stream`) and maintenance together make the
    index a live system — embeddings in, neighbors out, centroids
    fixed between offline re-trains.

    Exactly-once append without a table format's transaction log:

    1. STAGE — the batch is assigned (same two-level routing as the
       build) and written to ``incoming/batch=N`` with overwrite, so a
       replay regenerates it identically and never touches the live
       index;
    2. PUBLISH — any ``b{N}-*.parquet`` leftovers from a crashed
       attempt are removed from the live cells, then each staged file
       moves into its cell under the DETERMINISTIC name
       ``b{N}-{i}.parquet`` (os.replace — atomic overwrite), so a
       replayed publish converges instead of duplicating;
    3. MARKER — ``_append_batches/N.done`` short-circuits fully
       committed batches.

    A crash at ANY point replays to the same final file set.  Probes
    running concurrently see each cell's files appear atomically;
    `compact_ivf_index` later folds the accumulated per-batch files.
    Returns the (availableNow-triggered) writer.

    Unlike the serving sink, a FRESH checkpoint over an index that
    already holds another incarnation's append batches is REFUSED (a
    RuntimeError on the first batch): re-numbered batch ids neither
    line up with the published ``b{N}-*`` files (skipping loses data)
    nor cover the old run's higher-numbered batches (re-publishing
    duplicates them).  Resume the original checkpoint, or rebuild the
    index from scratch (a RE-TRAIN does not escape this guard: it
    carries both the committed rows and their run-scoped markers, so a
    fresh checkpoint over a retrained index would still re-read the
    whole source over data the index already holds).  Markers written
    before run scoping (bare ``done``) are accepted as own — the
    live-deployment upgrade path."""
    import shutil as _shutil

    cache: dict = {}

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            _refuse_foreign_chain(
                sess, f"{index_path}/_append_batches", cache["run"],
                "resume its original checkpoint, or rebuild the index "
                "from scratch",
            )
        run = cache["run"]
        marker = f"{index_path}/_append_batches/{batch_id}.done"
        if _marker_current(sess, marker, run) or batch_df.isEmpty():
            return
        stage = f"{index_path}/incoming/batch={batch_id}"
        similarity.append_to_ivf_index(
            batch_df, index_path, id_col=id_col, vec_col=vec_col,
            stage_dir=stage,
        )
        _publish_staged_cells(stage, f"{index_path}/vectors", batch_id)
        _shutil.rmtree(stage, ignore_errors=True)
        _write_marker(sess, marker, run)

    return (
        embs.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def admit_embeddings_stream(
    embs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    tau: float = 0.95,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Embedding-space streaming ADMISSION gate — the vector twin of
    the text tier's ``dedup_corpus_stream``: each micro-batch of new
    embeddings is (1) probed top-1 against the LIVE IVF index (a hit
    with cosine ≥ tau is a semantic re-scrape → rejected with its
    matched corpus id and score), (2) near-dup'd WITHIN the batch —
    candidates blocked by assigned index cell (the corpus's own
    quantizer as the blocking key, the semantic_dedup philosophy),
    edges at cosine ≥ tau, connected components, min-id survivor — and
    (3) survivors ABSORBED into the index through the maintainer's
    staged-append protocol (assign → stage → deterministic-name
    publish), so the NEXT batch probes against them.  Accepted rows
    land in ``out_path/accepted/batch=N``, rejected
    (doc, reason ∈ history|intra_batch, match_id, cosine) in
    ``out_path/rejected/batch=N``.

    Exactly-once: ONE run-scoped marker per batch
    (``_append_batches/N.done`` — this gate IS the index's appender,
    so it shares the maintainer's marker chain and its
    foreign-checkpoint refusal), and the batch's own published
    ``b{N}-*`` vector files are PURGED before the probe — a replay of
    a crashed attempt therefore probes the exact pre-batch index,
    recomputes the same deterministic decisions, and re-publishes
    under the same names (converges; the text gate's
    current-batch-partition exclusion, expressed in this layout's
    file-name scheme).

    Gate strictness is the IVF trade, stated honestly: nprobe bounds
    the history lookup — a re-scrape whose nearest cells aren't probed
    can slip through; raise nprobe toward n_cells for a strict gate
    (exact at nprobe = n_cells).  Intra-batch blocking scores the full
    fine-centroid list per batch (micro-batch-sized work); cells
    bound the pair blowup the way labels bound semantic_dedup.

    Same-id arrivals: the probe runs with ``exclude_self=False`` — an
    increment that REUSES an already-indexed vec_id (a re-crawl with
    stable document ids) matches its own history row at cosine 1.0 and
    is rejected as ``history`` with ``match_id`` = itself, never
    re-absorbed into a duplicate vec_id.  This is safe on replay
    because the batch's own published ``b{N}-*`` files are purged
    before the probe, so no true self rows can exist.

    The quantizer (centroid table) is loaded once per GENERATION, not
    per trigger — this gate is the index's own appender and appends
    never move centroids, so the generation (side-table mtimes, the
    serve loops' ``_quantizer_generation``) is append-stable by
    construction; it changes only when an offline blue/green re-train
    swaps the root, which the next trigger picks up like the serve
    loops do.

    The index must already exist (``write_ivf_index`` on the seed
    corpus).  Returns the (availableNow-triggered) writer."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from garmadon_spark.operators import dedup as _dedup

    cache: dict = {}

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            _refuse_foreign_chain(
                sess, f"{index_path}/_append_batches", cache["run"],
                "resume its original checkpoint, or rebuild the index "
                "from scratch",
            )
        run = cache["run"]
        marker = f"{index_path}/_append_batches/{batch_id}.done"
        if _marker_current(sess, marker, run) or batch_df.isEmpty():
            return
        # replay correctness: purge THIS batch's published files so the
        # probe sees the exact pre-batch index
        for stale in _glob.glob(
                f"{index_path}/vectors/ivf_cell=*/b{batch_id}-*.parquet"):
            _os.remove(stale)
        gen = _quantizer_generation(index_path, _IVF_GEN_SIDES)
        if cache.get("gen") != gen:
            cache["quant"] = similarity.load_ivf_centroids(
                sess, index_path
            )
            cache["gen"] = gen
        fine_rows, _coarse = cache["quant"]
        batch = batch_df.select(id_col, vec_col).persist()
        # exclude_self=False: the batch's own b{N} files were purged
        # above, so no true self rows exist even on replay — and a
        # same-id re-arrival must match its own history row (cosine
        # 1.0 ≥ tau → rejected as history), not slip past the gate
        top = similarity.ivf_topk_batch(
            sess, index_path, batch, k=1, nprobe=nprobe,
            query_id_col=id_col, query_vec_col=vec_col,
            exclude_self=False, centroids=cache["quant"],
        )
        hist_rej = (
            top.filter(F.col("cosine") >= tau)
            .select(F.col("query_id").alias("doc"),
                    F.lit("history").alias("reason"),
                    F.col("vec_id").alias("match_id"), "cosine")
            .persist()
        )
        # cell order = position: fine_rows sorted by cell id (dense
        # 0..k-1, the write_ivf_index layout) — same table the probe
        # used, read once per generation, never per trigger
        cents = [v for _cell, _branch, v in sorted(fine_rows)]
        assigned = similarity.assign_cells(
            batch, cents, vec_col, arrow=True
        ).select(F.struct(F.col(id_col).alias("doc"),
                          F.col(vec_col).alias("v")).alias("p"),
                 "ivf_cell")
        # round-6 compare, matching the probe leg's rounded cosine, so
        # an oracle replay can mirror both thresholds identically
        cands = _dedup.bucket_pairs(assigned, ["ivf_cell"], "p").select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.round(similarity.cosine(F.col("a.v"), F.col("b.v")), 6)
            .alias("cos"),
        ).filter(F.col("cos") >= tau)
        rej_ids = hist_rej.select("doc")
        edges = (
            cands
            .join(rej_ids.withColumnRenamed("doc", "doc_a"),
                  "doc_a", "left_anti")
            .join(rej_ids.withColumnRenamed("doc", "doc_b"),
                  "doc_b", "left_anti")
            .select("doc_a", "doc_b")
        )
        comp = _dedup.components(edges)
        intra_rej = comp.filter(
            F.col("doc_id") != F.col("component")
        ).select(
            F.col("doc_id").alias("doc"),
            F.lit("intra_batch").alias("reason"),
            F.col("component").alias("match_id"),
            F.lit(None).cast("double").alias("cosine"),
        )
        rejected = hist_rej.unionByName(intra_rej).persist()
        accepted = batch.join(
            rejected.select(F.col("doc").alias(id_col)),
            id_col, "left_anti",
        )
        stage = f"{index_path}/incoming/batch={batch_id}"
        try:
            accepted.write.mode("overwrite").parquet(
                f"{out_path}/accepted/batch={batch_id}"
            )
            rejected.write.mode("overwrite").parquet(
                f"{out_path}/rejected/batch={batch_id}"
            )
            similarity.append_to_ivf_index(
                accepted, index_path, id_col=id_col, vec_col=vec_col,
                stage_dir=stage,
            )
            _publish_staged_cells(
                stage, f"{index_path}/vectors", batch_id
            )
        finally:
            top._gs_unpersist()
            rejected.unpersist()
            hist_rej.unpersist()
            batch.unpersist()
        _shutil.rmtree(stage, ignore_errors=True)
        _write_marker(sess, marker, run)

    return (
        embs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )


def _publish_staged_cells(stage_root: str, live_root: str,
                          batch_id: int) -> None:
    """Publish one staged cell-partitioned tree into its live twin
    under the DETERMINISTIC names ``b{batch_id}-{i}.parquet``: stale
    leftovers of the same batch (a crashed earlier attempt) are removed
    first, so a replayed publish CONVERGES to the same final file set
    instead of duplicating — the step 2 of the maintainers' exactly-once
    protocol."""
    import glob as _glob
    import os as _os

    for stale in _glob.glob(
            f"{live_root}/ivf_cell=*/b{batch_id}-*.parquet"):
        _os.remove(stale)
    for cell_dir in sorted(_glob.glob(f"{stage_root}/ivf_cell=*")):
        cell = _os.path.basename(cell_dir)
        dst_dir = _os.path.join(live_root, cell)
        _os.makedirs(dst_dir, exist_ok=True)
        files = sorted(
            f for f in _os.listdir(cell_dir) if f.endswith(".parquet")
        )
        for i, f in enumerate(files):
            _os.replace(
                _os.path.join(cell_dir, f),
                _os.path.join(dst_dir, f"b{batch_id}-{i}.parquet"),
            )


def maintain_ivfpq_index_stream(
    embs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """maintain_ann_index_stream's twin for a persisted IVF-PQ index
    (similarity.write_ivfpq_index): each micro-batch is rotated into
    the index's space, assigned with the FROZEN quantizers, staged as
    BOTH its vectors and its PQ codes
    (similarity.append_to_ivfpq_index's staging redirect), then
    published into the two live trees under the same deterministic
    ``b{N}-{i}`` names and committed with one run-scoped marker.

    Crash at any point replays to the same final file set: the staged
    batch regenerates identically (frozen centroids, codebooks AND
    rotation), and the publish removes same-batch leftovers first.
    Vectors publish before codes, so a codes ``b{N}`` file implies its
    vectors are live; the marker commits only after both.  A fresh
    checkpoint over another incarnation's chain is refused — same
    guard, same remediation as maintain_ann_index_stream;
    retrain_ivfpq_index carries these markers (with content) across its
    blue/green swap and excludes published-but-unmarked batches from
    the rebuilt corpus."""
    import shutil as _shutil

    cache: dict = {}

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            _refuse_foreign_chain(
                sess, f"{index_path}/_append_batches", cache["run"],
                "resume its original checkpoint, or rebuild the index "
                "from scratch",
            )
        run = cache["run"]
        marker = f"{index_path}/_append_batches/{batch_id}.done"
        if _marker_current(sess, marker, run) or batch_df.isEmpty():
            return
        stage = f"{index_path}/incoming/batch={batch_id}"
        similarity.append_to_ivfpq_index(
            batch_df, index_path, id_col=id_col, vec_col=vec_col,
            stage_dir=stage,
        )
        _publish_staged_cells(
            f"{stage}/vectors", f"{index_path}/vectors", batch_id
        )
        _publish_staged_cells(
            f"{stage}/codes", f"{index_path}/codes", batch_id
        )
        _shutil.rmtree(stage, ignore_errors=True)
        _write_marker(sess, marker, run)

    return (
        embs.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )
