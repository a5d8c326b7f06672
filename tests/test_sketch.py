"""Misra–Gries frequent-items: fold unit tests + the merged-sketch
guarantee (presence above n/(k+1), lower-bound sandwich) on skewed
data across several partitionings."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from garmadon_spark.operators import sketch


def test_mg_fold_exact_below_k():
    c = sketch._mg_fold({}, ["a", "b", "a"], [2, 1, 3], k=4)
    assert c == {"a": 5, "b": 1}


def test_mg_fold_prunes_to_k_with_bounded_error():
    # 5 items, k=2: (k+1)-th largest = 3rd largest value is subtracted
    items = ["a", "b", "c", "d", "e"]
    counts = [10, 8, 5, 2, 1]
    c = sketch._mg_fold({}, items, counts, k=2)
    assert set(c) <= {"a", "b"} and len(c) <= 2
    assert c["a"] == 10 - 5 and c["b"] == 8 - 5


def test_freq_items_guarantee_on_skewed_data(spark):
    rng = random.Random(7)
    # zipf-ish: item i has weight ~ 1/(i+1)
    rows = [(rng.choices(range(20), weights=[1 / (i + 1) for i in range(20)])[0],)
            for i in range(20_000)]
    df = spark.createDataFrame(rows, "item int")
    exact = {r.item: r.c for r in df.groupBy("item")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    for k, parts in ((4, 1), (4, 8), (8, 3)):
        got = {r.item: r.count_lb for r in
               sketch.freq_items(df.repartition(parts), "item", k=k)
               .collect()}
        err = n / (k + 1)
        heavy = {i for i, c in exact.items() if c > err}
        assert heavy <= set(got), (k, parts)
        for i, lb in got.items():
            assert lb <= exact[i], (i, lb, exact[i])
            assert lb >= exact[i] - err, (i, lb, exact[i], err)


def test_freq_items_partial_row_budget(spark):
    df = spark.createDataFrame(
        [(i % 50,) for i in range(5_000)], "item int"
    ).repartition(4)
    partial = sketch.freq_items_partial(df, "item", k=6)
    # <= k rows per partition => <= k * partitions overall
    assert partial.count() <= 6 * 4


def test_freq_items_ignores_nulls_and_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (1,), (2,)], "item int"
    )
    got = {r.item: r.count_lb for r in
           sketch.freq_items(df, "item", k=8).collect()}
    assert got == {1: 2, 2: 1}
    with pytest.raises(ValueError):
        sketch.freq_items_partial(df, "item", k=0)


def test_freq_items_stream_guarantee_and_exactly_once(spark, tmp_path):
    """Streaming Misra-Gries maintainer: after draining a multi-batch
    stream the on-disk summary satisfies the n/(k+1) guarantee against
    exact counts over ALL the data; marker replays are no-ops; and a
    crash between summary publish and marker (last marker removed)
    replays to byte-identical state."""
    import glob
    import os

    from pyspark.sql import functions as F  # noqa: F811
    from garmadon_spark.streaming import sketch as ssk

    rng = random.Random(3)
    src = str(tmp_path / "items")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    for part in range(3):
        rows = [(rng.choices(range(12),
                             weights=[1 / (i + 1) for i in range(12)])[0],)
                for _ in range(4000)]
        spark.createDataFrame(rows, "item int").coalesce(1).write.mode(
            "append").parquet(src)
    out = str(tmp_path / "freq")
    k = 4

    def drain(ckpt):
        q = ssk.maintain_freq_items_stream(
            spark.readStream.schema("item int")
            .option("maxFilesPerTrigger", "1").parquet(src),
            out, str(tmp_path / ckpt), item_col="item", k=k,
        ).start()
        q.awaitTermination()

    drain("ck1")
    got, n = ssk.load_freq_summary(spark, out)
    df = spark.read.parquet(src)
    exact = {r.item: r.c for r in df.groupBy("item")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert n == sum(exact.values()) == 12000
    err = n / (k + 1)
    heavy = {i for i, c in exact.items() if c > err}
    assert heavy and heavy <= set(got)
    for i, lb in got.items():
        assert exact[i] - err <= lb <= exact[i]
    # bounded state on disk: newest 2 summaries, k rows each
    assert len(got) <= k
    sdirs = sorted(os.listdir(f"{out}/summary"))
    assert len(sdirs) <= 2

    # a FRESH checkpoint over the existing chain is refused (the
    # state chains — re-numbered batches would double-count)
    from pyspark.errors.exceptions.captured import StreamingQueryException
    with pytest.raises(StreamingQueryException,
                       match="different streaming incarnation"):
        drain("ck2")
    assert ssk.load_freq_summary(spark, out) == (got, n)  # untouched

    # crash AFTER commit: drop the checkpoint's last commit file so
    # the SAME checkpoint replays its final batch -> the run-scoped
    # marker short-circuits, summary unchanged
    def uncommit():
        last_commit = sorted(
            f for f in os.listdir(f"{tmp_path}/ck1/commits")
            if f.isdigit())[-1]
        os.remove(f"{tmp_path}/ck1/commits/{last_commit}")
        # the checksum sidecar too, or ChecksumFs refuses the rewrite
        try:
            os.remove(f"{tmp_path}/ck1/commits/.{last_commit}.crc")
        except FileNotFoundError:
            pass

    uncommit()
    drain("ck1")
    again, n2 = ssk.load_freq_summary(spark, out)
    assert again == got and n2 == n

    # crash BETWEEN publish and marker: lose the last marker too ->
    # the replayed batch refolds deterministically from its marked
    # predecessor, converging to identical state
    uncommit()
    last = sorted(glob.glob(f"{out}/_freq_batches/*.done"))[-1]
    os.remove(last)
    drain("ck1")
    healed, n3 = ssk.load_freq_summary(spark, out)
    assert healed == got and n3 == n


def test_freq_items_stream_empty_batch_never_dangles(spark, tmp_path):
    """An all-NULL micro-batch must not commit a marker without a
    summary: the newest marked batch always has its directory, so
    load_freq_summary never chases a dangling pointer and the prune
    never deletes the only real summaries."""
    import os

    from garmadon_spark.streaming import sketch as ssk

    src = str(tmp_path / "items")
    spark.createDataFrame([(1,)] * 50 + [(2,)] * 10, "item int") \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(None,)] * 20, "item int") \
        .coalesce(1).write.mode("append").parquet(src)
    q = ssk.maintain_freq_items_stream(
        spark.readStream.schema("item int")
        .option("maxFilesPerTrigger", "1").parquet(src),
        str(tmp_path / "freq"), str(tmp_path / "ck"),
        item_col="item", k=4,
    ).start()
    q.awaitTermination()
    out = str(tmp_path / "freq")
    got, n = ssk.load_freq_summary(spark, out)
    assert got == {1: 50, 2: 10} and n == 60
    # every marker has its summary directory
    marked = {f[:-len(".done")]
              for f in os.listdir(f"{out}/_freq_batches")
              if f.endswith(".done") and not f.startswith(".")}
    have = {d[len("batch="):] for d in os.listdir(f"{out}/summary")}
    assert marked <= have


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        data=st.lists(
            st.tuples(st.integers(0, 30), st.integers(1, 50)),
            min_size=1, max_size=60,
        ),
        k=st.integers(1, 8),
        cut=st.integers(0, 59),
    )
    @settings(max_examples=200, deadline=None)
    def test_mg_fold_property(data, k, cut):
        """Fold any (item, count) stream in two chunks through
        _mg_fold: every surviving counter is sandwiched between
        true - n/(k+1) and true, at most k survive, and every item
        with true count > n/(k+1) survives."""
        exact: dict = {}
        for it, c in data:
            exact[it] = exact.get(it, 0) + c
        n = sum(exact.values())
        chunks = [data[:cut], data[cut:]]
        counters: dict = {}
        for chunk in chunks:
            counters = sketch._mg_fold(
                counters, [i for i, _ in chunk], [c for _, c in chunk], k
            )
        err = n / (k + 1)
        assert len(counters) <= k
        for it, lb in counters.items():
            assert lb <= exact[it]
            assert lb >= exact[it] - err
        for it, c in exact.items():
            if c > err:
                assert it in counters
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_heavy_served_stream_batch_parity(spark):
    """The stream-served panel (ev_heavy_served — read from the
    maintained k-row summary) and its batch twin (ev_heavy_value_buckets
    — one-shot merged sketch) agree on the guaranteed set: every bucket
    with true frequency > n/(k+1) appears in BOTH with its count_lb
    sandwiched against the exact count.  Counter values legitimately
    differ (fold order vs partition merge); the contract is what's
    shared."""
    from pyspark.sql import functions as F  # noqa: F811
    from garmadon_spark.queries import dashboard as db

    sf = "/root/testdata/sf0.001"
    served = {r.bucket: r.count_lb
              for r in db.ev_heavy_served(spark, sf).collect()}
    batch = {r.bucket: r.count_lb
             for r in db.ev_heavy_value_buckets(spark, sf).collect()}
    ev = db._value_buckets(spark, sf)
    exact = {r.bucket: r.c for r in ev.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    thr = n / (db._FREQ_K + 1)
    heavy = {b for b, c in exact.items() if c > thr}
    assert heavy
    for summary in (served, batch):
        assert heavy <= set(summary)
        for b, lb in summary.items():
            assert exact[b] - thr <= lb <= exact[b]
    # and the served check query itself is all-green
    for r in db.ev_heavy_served_check(spark, sf).collect():
        assert r.in_summary and r.bound_ok and r.counted_all
