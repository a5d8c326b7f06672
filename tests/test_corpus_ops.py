"""Corpus-prep operators (operators/corpus.py): PII scrub, boilerplate
line removal, sequence packing — exact semantics on handcrafted docs."""

from __future__ import annotations

import pytest

from garmadon_spark.operators import corpus


def test_scrub_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "write to a@b.com or c.d@e.org today"),
            (2, "server 10.0.42.7 answered, call 555-0134 now"),
            (3, "ip-free and phone-free text"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in corpus.scrub_pii(df).collect()}
    assert rows[1].n_email == 2 and rows[1].n_ipv4 == 0
    assert rows[1].text == "write to <EMAIL> or <EMAIL> today"
    assert rows[2].n_ipv4 == 1 and rows[2].n_phone == 1
    assert rows[2].text == "server <IP> answered, call <PHONE> now"
    assert rows[3].n_email == rows[3].n_ipv4 == rows[3].n_phone == 0
    assert rows[3].text == "ip-free and phone-free text"


def test_scrub_pii_no_double_count(spark):
    # the IP is redacted before the phone pattern runs, so its digit
    # runs are not also counted as a phone number
    df = spark.createDataFrame(
        [(1, "octets 111.222.333.444 only")], "doc_id long, text string"
    )
    r = corpus.scrub_pii(df).collect()[0]
    assert r.n_ipv4 == 1 and r.n_phone == 0
    assert r.text == "octets <IP> only"


def test_scrub_pii_null_text_zero_counts(spark):
    # NULL text passes through as NULL, but counts are 0 (not NULL) so
    # downstream aggregations over n_<name> don't silently skip the doc
    df = spark.createDataFrame(
        [(1, None), (2, "mail a@b.com")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in corpus.scrub_pii(df).collect()}
    assert rows[1].text is None
    assert rows[1].n_email == 0
    assert rows[1].n_ipv4 == 0
    assert rows[1].n_phone == 0
    assert rows[2].n_email == 1


@pytest.fixture()
def lined_docs(spark):
    return spark.createDataFrame(
        [
            (1, "cookie banner\nunique one\ncopyright foo"),
            (2, "cookie banner\nunique two"),
            (3, "copyright foo\ncookie banner"),
            (4, "all alone here"),
            (5, "cookie banner"),  # nothing survives
        ],
        "doc_id long, text string",
    )


def test_remove_frequent_lines(spark, lined_docs):
    out = {
        r.doc_id: r
        for r in corpus.remove_frequent_lines(
            lined_docs, min_df=2
        ).collect()
    }
    assert len(out) == 5
    assert out[1].text == "unique one" and out[1].n_lines_before == 3
    assert out[2].text == "unique two"
    assert out[3].text == "" and out[3].n_lines_kept == 0
    assert out[4].text == "all alone here" and out[4].n_lines_kept == 1
    assert out[5].text == "" and out[5].n_lines_before == 1


def test_remove_frequent_lines_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "z last\nboiler\na first\nboiler"), (2, "boiler")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in corpus.remove_frequent_lines(df, min_df=2).collect()
    }
    assert out[1] == "z last\na first"


def test_remove_frequent_lines_regex_delim_requires_join_delim(spark):
    df = spark.createDataFrame(
        [(1, "boiler, unique one ; boiler"), (2, "boiler")],
        "doc_id long, text string",
    )
    # a regex delimiter with no explicit join string would reassemble
    # wrong text — refuse instead of guessing
    with pytest.raises(ValueError, match="join_delim"):
        corpus.remove_frequent_lines(df, delim=r"\s*[,;]\s*", min_df=2)
    out = {
        r.doc_id: r.text
        for r in corpus.remove_frequent_lines(
            df, delim=r"\s*[,;]\s*", min_df=2, join_delim="; "
        ).collect()
    }
    assert out[1] == "unique one"
    assert out[2] == ""


def test_remove_frequent_lines_string_df_decides(spark):
    # the drop decision is the per-STRING doc frequency, re-counted
    # inside the heavy-hash subset — a hash collision can propose an
    # innocent line as a candidate but its own df (< min_df) keeps it
    df = spark.createDataFrame(
        [(1, "keep me\nboiler"), (2, "boiler\nalso kept"), (3, "boiler")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in corpus.remove_frequent_lines(df, min_df=2).collect()
    }
    assert out == {1: "keep me", 2: "also kept", 3: ""}
    # white-box collision check: feed the string-recount stage a forged
    # heavy-hash set containing an innocent line's hash and assert the
    # string-keyed df filter rejects it (df=1 < min_df)
    from pyspark.sql import functions as F

    lines = corpus.split_lines(df).withColumn(
        "line_h", F.xxhash64("line"))
    forged = lines.select("line_h").distinct()  # every hash "heavy"
    heavy = (
        lines.join(F.broadcast(forged), "line_h", "left_semi")
        .groupBy("line_h", "line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
    )
    assert [r.line for r in heavy.collect()] == ["boiler"]


def test_heavy_line_antijoin_is_broadcast(spark, lined_docs):
    plan = corpus.remove_frequent_lines(
        lined_docs, min_df=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_pack_sequences_assignment(spark):
    # shard 0 gets doc 8 (3 tokens); shard 1 gets docs 1 (4), 9 (5):
    # stream = [0,4) ⊕ [4,9) with seq_len 4 → doc 9 straddles packs 1-2
    df = spark.createDataFrame(
        [(1, "a b c d"), (8, "x y z"), (9, "p q r s t")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in corpus.pack_sequences(df, seq_len=4, n_shards=8).collect()
    }
    assert rows[8].shard == 0 and rows[8].first_pack == 0
    assert rows[1].shard == 1
    assert (rows[1].first_pack, rows[1].last_pack) == (0, 0)
    assert rows[9].start_token == 4
    assert (rows[9].first_pack, rows[9].last_pack) == (1, 2)


def test_pack_summary_invariants(spark):
    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join("w" for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assigned = corpus.pack_sequences(df, seq_len=32, n_shards=4)
    summary = corpus.pack_summary(assigned, seq_len=32).collect()
    total = sum(r.pack_tokens for r in summary)
    expect = sum(len(t.split(" ")) for _, t in docs)
    assert total == expect
    # every pack except each shard's last is exactly full
    by_shard = {}
    for r in summary:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, packs in by_shard.items():
        packs.sort(key=lambda r: r.pack)
        assert all(p.pack_tokens == 32 for p in packs[:-1])
        assert 0 < packs[-1].pack_tokens <= 32


def test_mixture_plan_rates_and_composition(spark):
    """The planner's rates are min(1, budget·share/avail); saturated
    strata flag `short`; feeding the rates to stratified_hash_sample
    lands each stratum within sampling noise of its expected mass."""
    from garmadon_spark.operators import corpus
    from garmadon_spark.operators import text as text_ops

    rows = []
    for i in range(3000):
        lang = ["en", "en", "en", "de", "zh", "fr"][i % 6]
        rows.append((i, lang, "w " * 20 + "end"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    targets = {"en": 0.4, "de": 0.4, "zh": 0.2}
    plan = {r.lang: r for r in corpus.mixture_plan(
        df, targets, budget_fraction=0.5).collect()}
    assert set(plan) == {"en", "de", "zh", "fr"}
    assert plan["fr"].sample_rate == 0.0          # absent from targets
    assert plan["de"].short and plan["de"].sample_rate == 1.0
    # en: avail=1500 docs*22 tokens, budget=0.5*total; want=0.4*budget
    total = sum(p.avail_tokens for p in plan.values())
    import math
    want_en = 0.5 * total * 0.4
    assert math.isclose(plan["en"].sample_rate,
                        round(want_en / plan["en"].avail_tokens, 4),
                        abs_tol=1e-4)
    # compose with the deterministic sampler: per-stratum doc counts
    # land within binomial noise of rate * n_docs
    from pyspark.sql import functions as F

    rates = {s: p.sample_rate for s, p in plan.items()}
    out = text_ops.stratified_hash_sample(
        df, "doc_id", rates, stratum_col="lang")
    got = {r.lang: r.c for r in out.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert "fr" not in got
    assert got["de"] == 500                        # rate 1.0 keeps all
    exp_en = rates["en"] * 1500
    assert abs(got["en"] - exp_en) < 4 * (1500 ** 0.5)


def test_chunk_documents_windows_and_metadata(spark):
    df = spark.createDataFrame(
        [(1, "en", "abcdefghij"),      # 10 chars
         (2, "de", "xyz"),             # shorter than one window
         (3, "fr", ""),                # empty -> no chunks
         (4, "zh", None)],             # null -> no chunks
        "doc_id long, lang string, text string",
    )
    out = corpus.chunk_documents(df, chunk_chars=4, overlap=1).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}
    # doc 1: starts 0,3,6,9 (step 3), windows of 4 chars, last short
    got = sorted((r.chunk_idx, r.chunk_start, r.chunk_text, r.chunk_len)
                 for r in by_doc[1])
    assert got == [(0, 0, "abcd", 4), (1, 3, "defg", 4),
                   (2, 6, "ghij", 4), (3, 9, "j", 1)]
    # overlap: consecutive windows share `overlap` chars
    assert got[0][2][-1] == got[1][2][0]
    # metadata columns ride along
    assert by_doc[2][0].lang == "de"
    assert by_doc[2][0].chunk_text == "xyz"


def test_chunk_documents_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.chunk_documents(df, chunk_chars=0)
    with _pytest.raises(ValueError):
        corpus.chunk_documents(df, chunk_chars=4, overlap=4)


def test_chunk_documents_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, "abcdef" * 10)], "doc_id long, text string")
    plan = corpus.chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_report_one_scan_stats(spark):
    df = spark.createDataFrame(
        [(1, "en", "s1", "a b c"),
         (2, "en", "s1", "a b c"),       # exact dup of doc 1
         (3, "en", "s1", "d e"),
         (4, "de", "s2", "x")],
        "doc_id long, lang string, source string, text string",
    )
    rows = {(r.lang, r.source): r
            for r in corpus.corpus_report(df).collect()}
    en = rows[("en", "s1")]
    assert en.n_docs == 3 and en.n_distinct_texts == 2
    assert abs(en.dup_ratio - round(1 - 2 / 3, 4)) < 1e-9
    assert en.total_chars == 13 and en.total_tokens == 8
    assert en.median_chars == 5.0
    de = rows[("de", "s2")]
    assert de.n_docs == 1 and de.dup_ratio == 0.0


def test_corpus_report_approx_mode_tracks_exact(spark):
    rows = [(i, "en", "s", f"text {i % 37} body") for i in range(3000)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    ex = corpus.corpus_report(df).head()
    ap = corpus.corpus_report(df, exact=False).head()
    assert ex.n_distinct_texts == 37
    # HLL at rsd=0.01: 5-sigma bound like the dashboard's cardinality gate
    assert abs(ap.n_distinct_texts - 37) <= max(1, 5 * 0.01 * 37)
    assert ap.n_docs == ex.n_docs == 3000
    assert ap.total_tokens == ex.total_tokens


# --- incremental corpus datasheet ----------------------------------------


def _report_docs(spark):
    from garmadon_spark.session import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_report_partials_fold_equals_one_shot(spark, tmp_path):
    """Folding the corpus in 3 increments produces the SAME merged
    state as one shot — sums sum and sketches union, so increment
    order and grouping cannot matter (the mergeability contract)."""
    from pyspark.sql import functions as F

    docs = _report_docs(spark)
    path = str(tmp_path / "state")
    for i in range(3):
        corpus.maintain_corpus_report(
            spark, docs.filter(F.col("doc_id") % 3 == i), path
        )
    folded = corpus.corpus_report_from_partials(
        spark.read.parquet(path)
    )
    oneshot = corpus.corpus_report_from_partials(
        corpus.corpus_report_partials(docs)
    )
    key = lambda r: (r.lang, r.source)  # noqa: E731
    f = {key(r): r for r in folded.collect()}
    o = {key(r): r for r in oneshot.collect()}
    assert set(f) == set(o)
    for k in f:
        assert f[k] == o[k], k


def test_report_from_partials_parity_with_batch_report(spark):
    """The served datasheet matches the exact one-scan corpus_report:
    scalars EXACTLY; distinct within 5·rsd of exact (the
    ev_distinct_merge_check contract); the median estimate within one
    char_bin of the exact MEDIAN-RANK ORDER STATISTIC — the bin walk
    estimates the value at rank ⌈q·n⌉, which for a 2-doc cohort can
    legitimately sit far from percentile()'s midpoint interpolation,
    so the order statistic is the honest comparison target."""
    from pyspark.sql import functions as F

    docs = _report_docs(spark)
    served = {
        (r.lang, r.source): r
        for r in corpus.corpus_report_from_partials(
            corpus.corpus_report_partials(docs)
        ).collect()
    }
    exact = {
        (r.lang, r.source): r
        for r in corpus.corpus_report(docs).collect()
    }
    chars: dict = {}
    for r in docs.select(
            "lang", "source", F.length("text").alias("c")).collect():
        chars.setdefault((r.lang, r.source), []).append(r.c)
    assert set(served) == set(exact)
    rsd = 1.04 / (2 ** (corpus.REPORT_HLL_LG_K / 2))
    for k, s in served.items():
        e = exact[k]
        assert (s.n_docs, s.total_chars, s.total_tokens) == (
            e.n_docs, e.total_chars, e.total_tokens), k
        assert s.mean_tokens == e.mean_tokens, k
        assert abs(s.n_distinct_texts - e.n_distinct_texts) \
            <= max(1, 5 * rsd * e.n_distinct_texts), k
        vals = sorted(chars[k])
        stat = vals[max(0, -(-len(vals) // 2) - 1)]   # rank ceil(n/2)
        assert abs(s.median_chars_est - stat) \
            <= corpus.REPORT_CHAR_BIN, (k, stat, s.median_chars_est)


def test_corpus_report_stream_exactly_once(spark, tmp_path):
    """The continuous datasheet folds each batch once: after draining a
    3-file stream the state equals the one-shot report; a replayed
    committed batch short-circuits on its run-scoped marker; a fresh
    checkpoint over the fold chain is refused."""
    import os

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )
    from pyspark.sql import functions as F

    docs = _report_docs(spark)
    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1) \
            .write.mode("append").parquet(src)
    path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drain(cp):
        q = corpus.corpus_report_stream(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(src),
            path, cp,
        ).start()
        q.awaitTermination()

    drain(ckpt)
    served = corpus.corpus_report_from_partials(
        spark.read.parquet(path)
    ).collect()
    oneshot = {
        (r.lang, r.source): r
        for r in corpus.corpus_report_from_partials(
            corpus.corpus_report_partials(docs)
        ).collect()
    }
    assert {(r.lang, r.source): r for r in served} == oneshot

    # replay the last batch (uncommit): the marker short-circuits, the
    # state is untouched
    commits = f"{ckpt}/commits"
    last = sorted(f for f in os.listdir(commits) if f.isdigit())[-1]
    os.remove(f"{commits}/{last}")
    try:
        os.remove(f"{commits}/.{last}.crc")
    except FileNotFoundError:
        pass
    drain(ckpt)
    again = {
        (r.lang, r.source): r
        for r in corpus.corpus_report_from_partials(
            spark.read.parquet(path)
        ).collect()
    }
    assert again == oneshot

    # fresh checkpoint over the fold chain: refused
    with _pytest.raises(StreamingQueryException,
                        match="different streaming incarnation"):
        drain(str(tmp_path / "ckpt2"))


def test_corpus_report_stream_prunes_markers(spark, tmp_path):
    """The fold's commit-marker directory is BOUNDED: after draining
    more batches than _REPORT_RETAIN_MARKERS, only the newest retained
    markers remain (a committed fold can never replay — the checkpoint
    committed past it — so old markers are dead weight), the newest
    marker survives (what _refuse_foreign_chain's O(1) read needs),
    and the folded state still equals the one-shot report."""
    import os

    from pyspark.sql import functions as F

    docs = _report_docs(spark)
    src = str(tmp_path / "src")
    n_batches = corpus._REPORT_RETAIN_MARKERS + 3
    for i in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == i).coalesce(1) \
            .write.mode("append").parquet(src)
    path = str(tmp_path / "state")
    q = corpus.corpus_report_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
        path, str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination()

    markers = sorted(
        int(f[: -len(".done")])
        for f in os.listdir(f"{path}/_report_batches")
        if f.endswith(".done")
    )
    assert len(markers) <= corpus._REPORT_RETAIN_MARKERS
    assert markers[-1] == n_batches - 1      # the newest always survives
    served = {
        (r.lang, r.source): r
        for r in corpus.corpus_report_from_partials(
            spark.read.parquet(path)
        ).collect()
    }
    oneshot = {
        (r.lang, r.source): r
        for r in corpus.corpus_report_from_partials(
            corpus.corpus_report_partials(docs)
        ).collect()
    }
    assert served == oneshot
