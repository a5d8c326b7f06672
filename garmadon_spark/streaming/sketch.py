"""Streaming heavy hitters: maintain a Misra–Gries summary over an
event stream with BOUNDED state and exactly-once semantics.

The batch sketch (operators/sketch.py) answers "which items dominate
this table"; a monitoring deployment needs the same answer over the
live stream without keeping per-key state (the 100 TB key-space
problem that rules out a streaming groupBy on the raw key).  This
maintainer folds each micro-batch's partial summaries into ONE k-entry
summary:

- per batch: the distributed partial pass (``freq_items`` — ≤ k rows
  per partition, summary-sized merge) produces the batch's summary;
- the running summary (k rows — KILOBYTES, read driver-side) absorbs
  it via the mergeable-summaries fold (itemwise sum + (k+1)-th-largest
  prune), which preserves the error bound: after any prefix of batches
  totalling n rows, every counter satisfies
  ``true − n/(k+1) ≤ count_lb ≤ true``; items above n/(k+1) are
  guaranteed present (errors of merged summaries ADD, and
  Σ n_b/(k+1) = n/(k+1) — Agarwal et al., PODS 2012);
- exactly-once by the repo's marker protocol: each batch publishes the
  post-fold summary to the DETERMINISTIC directory
  ``summary/batch={N}`` (computed from the marked predecessor, so a
  crashed-and-replayed batch converges to byte-identical state),
  then commits ``_freq_batches/{N}.done``.  The newest MARKED batch is
  the live summary; unmarked directories are in-flight or crashed
  attempts and never read.  Superseded summaries are pruned past the
  newest two (the predecessor must survive until its successor is
  marked, for replay determinism).  A genuine crash always loses the
  NEWEST marker (markers commit before the next batch starts), so the
  replay's predecessor read is well-defined.  Markers are run-scoped:
  a fresh checkpoint over an existing chain is refused on its first
  batch — re-numbered batch ids would refold counted data.

State on disk: k rows + one meta row per retained batch.  Driver
memory: O(k).  Nothing anywhere is keyed on the raw item space.

Filesystem scope: MARKERS go through the Hadoop FS API (write AND
discovery — consistent on hdfs:// / s3a://), but the summary state
itself (``_meta.json`` via open(), prune via shutil) is a LOCAL-FS
implementation like sinks.archive.apply_retention / streaming.ann's
results retention — on a cluster the k-row summary belongs in a
table-format table or a key-value store, not a posix directory.
"""

from __future__ import annotations

import json as _json
import os as _os
import re as _re
import shutil as _shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmadon_spark.operators.sketch import _mg_fold, freq_items_partial
from garmadon_spark.sinks.rollup import (
    _checkpoint_run_id,
    _list_markers,
    _marker_current,
    _refuse_foreign_chain,
    _write_marker,
)

_RETAIN_SUMMARIES = 2


def _marked_batches(spark, out_path: str) -> list:
    """Marked batch ids, via the Hadoop FS API — the same listing the
    markers were written through (os.listdir silently sees nothing on
    hdfs://s3a:// paths, turning every guard built on it into a no-op
    — the trap rollup._list_markers documents)."""
    out = []
    for m in _list_markers(spark, f"{out_path}/_freq_batches"):
        stem = m.rsplit("/", 1)[-1][: -len(".done")]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def load_freq_summary(spark, out_path: str):
    """The live summary: (counters dict, n_total) of the newest MARKED
    batch, or ({}, 0) before the first commit.  k-sized driver read."""
    marked = _marked_batches(spark, out_path)
    if not marked:
        return {}, 0
    d = f"{out_path}/summary/batch={marked[-1]}"
    meta = _json.load(open(f"{d}/_meta.json"))
    rows = spark.read.parquet(d).collect()
    return {r.item: r.count_lb for r in rows}, int(meta["n_total"])


def maintain_freq_items_stream(
    items: DataFrame,
    out_path: str,
    checkpoint: str,
    item_col: str = "item",
    k: int = 64,
):
    """Wire an item stream to the summary maintainer; returns the
    (unstarted, availableNow-triggered) ``DataStreamWriter``.  NULL
    items are ignored (matching the batch sketch)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cache: dict = {}

    def _absorb(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            # a FRESH checkpoint over an existing summary chain is
            # REFUSED: re-numbered batches would refold data the live
            # summary already counted (the state CHAINS, unlike the
            # serving sink's independent per-batch partitions)
            _refuse_foreign_chain(
                sess, f"{out_path}/_freq_batches", cache["run"],
                "resume its original checkpoint or clear the output "
                "path",
            )
        run = cache["run"]
        marker = f"{out_path}/_freq_batches/{batch_id}.done"
        if _marker_current(sess, marker, run):
            return
        nn = batch_df.filter(F.col(item_col).isNotNull())
        # ONE scan: per-partition summaries + (NULL, n_p) count rows
        rows = freq_items_partial(
            nn, item_col, k, count_rows=True
        ).collect()
        n_batch = sum(r.cnt for r in rows if r.item is None)
        batch_rows = [(r.item, r.cnt) for r in rows if r.item is not None]
        if n_batch == 0:
            # nothing to publish — and NO marker: a marker without its
            # summary directory would make the newest marked batch a
            # dangling pointer (load_freq_summary reads marked[-1]'s
            # _meta.json) and let the prune delete the only real
            # summaries.  An empty batch replays to another no-op.
            return
        # fold into the marked predecessor (replay-deterministic: a
        # crashed attempt's unmarked directory is never read)
        prev, n_prev = load_freq_summary(sess, out_path)
        merged = _mg_fold(
            dict(prev),
            [i for i, _ in batch_rows],
            [c for _, c in batch_rows],
            k,
        )
        d = f"{out_path}/summary/batch={batch_id}"
        _shutil.rmtree(d, ignore_errors=True)
        item_type = nn.schema[item_col].dataType.simpleString()
        sess.createDataFrame(
            list(merged.items()), f"item {item_type}, count_lb long"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        with open(f"{d}/_meta.json", "w") as fh:
            _json.dump({"n_total": n_prev + n_batch, "k": k}, fh)
        _write_marker(sess, marker, run)
        # prune superseded summaries (keep the newest _RETAIN_SUMMARIES
        # marked ones; never touch unmarked = in-flight) AND their
        # markers — a committed batch can never replay (the checkpoint
        # committed past it), so its marker's only remaining job is
        # done and the marker dir stays bounded instead of growing
        # O(total batches ever)
        marked = _marked_batches(sess, out_path)
        superseded = set(marked[:-_RETAIN_SUMMARIES])
        sdir = f"{out_path}/summary"
        for entry in _os.listdir(sdir) if _os.path.isdir(sdir) else []:
            m = _re.fullmatch(r"batch=(\d+)", entry)
            if m and int(m.group(1)) in superseded:
                _shutil.rmtree(f"{sdir}/{entry}", ignore_errors=True)
        from garmadon_spark.sinks.rollup import _hadoop_fs
        for b in superseded:
            fs, jp = _hadoop_fs(
                sess, f"{out_path}/_freq_batches/{b}.done")
            fs.delete(jp, False)

    return (
        items.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )
