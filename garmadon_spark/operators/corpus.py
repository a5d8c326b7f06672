"""Corpus-preparation operators for LLM training-data pipelines: PII
scrubbing, boilerplate line removal (line-frequency dedup), and
sequence packing.

These extend the engine's read-side surface with the operations a
pretraining-corpus pipeline runs between raw scrape and tokenizer.
Scale design per operator:

- ``scrub_pii``: regexp redaction as pure JVM scalar expressions —
  zero shuffle, whole-stage codegen, linear scan.
- ``remove_frequent_lines``: drop lines whose document frequency
  reaches ``min_df`` (boilerplate: nav bars, cookie banners, license
  headers — the CCNet/RefinedWeb cleanup step).  Plan: line explode →
  df-count keyed on a 64-bit line hash (the shuffle moves hashes, not
  strings) → the heavy-line set (small: it is the boilerplate
  vocabulary, not the corpus) broadcast back as an anti-join →
  order-preserving reassembly.  Two uniform-keyed shuffles total.
- ``pack_sequences``: concat-then-chunk packing bookkeeping: each doc
  gets its token span in a per-shard stream and every ``seq_len``-token
  pack it touches.  One running-sum window per shard (state O(1));
  shards scale with the cluster, there is no global sort.  At 100 TB
  the shard key is the input split / date partition instead of
  ``doc_id % n`` — same plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER on the progressively
# scrubbed text (so a phone-like fragment inside an already-redacted IP
# is not double-counted).  Patterns stay inside the syntax subset that
# Java regex (Spark) and RE2 (DuckDB oracle) evaluate identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b\+?[0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{3,4})?\b",
     "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Redact PII-shaped spans; adds ``n_<name>`` match counts and
    replaces ``text_col`` with the scrubbed text.  All scalar
    expressions — no shuffle, no Python.

    NULL ``text_col`` rows pass the NULL through unchanged and report 0
    for every match count (not NULL — downstream aggregations over the
    counts must not silently skip those docs)."""
    pats = PII_PATTERNS if patterns is None else patterns
    is_null = F.col(text_col).isNull()
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, repl in pats:
        counts.append(
            F.when(is_null, F.lit(0))
            .otherwise(
                F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            )
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    others = [c for c in df.columns if c != text_col]
    return df.select(*others, *counts, cur.alias(text_col))


def split_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """One row per (doc, line_no, line).  ``delim`` is a Java regex."""
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), delim, -1)).alias(
            "line_no", "line"
        ),
    )


def heavy_lines(
    lines: DataFrame, id_col: str = "doc_id", min_df: int = 2
) -> DataFrame:
    """Lines appearing in >= min_df distinct docs, keyed by xxhash64 —
    the aggregation shuffles 8-byte hashes instead of line strings.
    Collision risk is the standard 64-bit birthday bound (negligible at
    boilerplate-set sizes; join on the string itself if a corpus ever
    approaches 2^32 distinct lines)."""
    return (
        lines.groupBy(F.xxhash64("line").alias("line_h"))
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
    )


_REGEX_META = set("\\[](){}.*+?^$|")


def remove_frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_df: int = 2,
    join_delim: str | None = None,
    persist_lines: bool = True,
) -> DataFrame:
    """Boilerplate removal: drop every line whose doc-frequency reaches
    ``min_df``, preserving intra-doc line order.  Returns one row per
    input doc: (id, n_lines_before, n_lines_kept, text) — docs whose
    every line was heavy keep an empty string.

    ``delim`` is the split REGEX; ``join_delim`` is the LITERAL string
    used to reassemble kept lines.  When ``join_delim`` is None the
    split delimiter is reused — valid only when it is a literal (no
    regex metacharacters); a regex ``delim`` without an explicit
    ``join_delim`` raises rather than silently emitting wrong text.

    The heavy set is broadcast (it is the boilerplate vocabulary —
    bounded, not corpus-sized), so the drop adds no shuffle; the
    reassembly is the one shuffle on the doc id.  Collision safety in
    two stages: the corpus-wide doc-frequency count shuffles only the
    8-byte line hash, then the doc frequency is RE-COUNTED per (hash,
    string) within the heavy-hash subset alone (boilerplate-vocabulary-
    sized, so shuffling those strings is cheap) — an innocent line whose
    hash collides with boilerplate is only dropped if its OWN string's
    doc frequency reaches ``min_df``.

    The exploded line table feeds all three passes (hash-df count,
    string-df recount, reassembly), so it is persisted once
    (``persist_lines``; release via the returned frame's
    ``_gs_unpersist``) — the plan previously re-split and re-exploded
    the corpus per branch (6 Generates / 16 Exchanges at sf0.1), and a
    separate ``before`` leg re-split it once more for a count the
    reassembly aggregate already knows: every doc has ≥1 line row
    (``split(_, -1)`` keeps empty segments), so one conditional
    aggregate emits before/kept/text together and the old outer join
    disappears."""
    from pyspark import StorageLevel

    if join_delim is None:
        if _REGEX_META & set(delim):
            raise ValueError(
                f"delim {delim!r} contains regex metacharacters; pass an"
                " explicit join_delim for reassembly"
            )
        join_delim = delim
    lines = split_lines(df, id_col, text_col, delim).withColumn(
        "line_h", F.xxhash64("line")
    )
    if persist_lines:
        lines = lines.persist(StorageLevel.MEMORY_AND_DISK)
    heavy_h = heavy_lines(lines, id_col, min_df).select("line_h")
    # per-string df recount within the heavy-hash subset: collisions
    # inflate the hash-keyed count, never the string-keyed one
    heavy = (
        lines.join(F.broadcast(heavy_h), "line_h", "left_semi")
        .groupBy("line_h", "line")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("line_h", "line", F.lit(True).alias("_hv"))
    )
    flagged = lines.join(F.broadcast(heavy), ["line_h", "line"], "left")
    keep = F.col("_hv").isNull()
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines_before"),
        F.count(F.when(keep, 1)).alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(
                        F.struct("line_no", keep.alias("keep"), "line")
                    )),
                    lambda x: x["keep"],
                ),
                lambda x: x["line"],
            ),
            join_delim,
        ).alias(text_col),
    ).select(
        id_col, "n_lines_before", "n_lines_kept", text_col,
    )
    out._gs_unpersist = lines.unpersist if persist_lines else (lambda: None)
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard, docs are
    concatenated in ``id_col`` order and the token stream is cut into
    ``seq_len``-token packs (docs may straddle a boundary — the
    standard pretraining layout).  Returns the per-doc assignment:
    (id, shard, n_tokens, start_token, first_pack, last_pack)."""
    toks = F.size(F.split(F.col(text_col), " ", -1)).cast("long")
    d = df.select(
        id_col,
        (F.col(id_col) % n_shards).alias("shard"),
        toks.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    d = d.withColumn("cum", F.sum("n_tokens").over(w))
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("cum") - F.col("n_tokens")).alias("start_token"),
        F.expr(f"(cum - n_tokens) div {seq_len}").alias("first_pack"),
        F.expr(f"(cum - 1) div {seq_len}").alias("last_pack"),
    )


def pack_summary(assigned: DataFrame, seq_len: int = 256) -> DataFrame:
    """Per-(shard, pack) occupancy: doc count, token count (== seq_len
    for every pack but a shard's last), and boundary-straddling docs.
    The 1→N doc→pack expansion is bounded by ceil(n_tokens/seq_len)
    per doc."""
    ex = assigned.select(
        "shard",
        "start_token",
        "n_tokens",
        (F.col("first_pack") != F.col("last_pack")).alias("straddles"),
        F.explode(F.sequence("first_pack", "last_pack")).alias("pack"),
    )
    in_pack = F.least(
        F.col("start_token") + F.col("n_tokens"),
        (F.col("pack") + 1) * seq_len,
    ) - F.greatest(F.col("start_token"), F.col("pack") * seq_len)
    return ex.groupBy("shard", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(in_pack).alias("pack_tokens"),
        F.count(F.when(F.col("straddles"), 1)).alias("n_boundary_docs"),
    )


def mixture_plan(
    docs: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "lang",
    text_col: str = "text",
    budget_fraction: float = 0.5,
) -> DataFrame:
    """Training-mix planner: turn target mixture WEIGHTS into
    per-stratum sampling RATES against the corpus actually on disk —
    the step between "we want 50 % en / 20 % code / …" (The Pile,
    LLaMA's mixture tables) and a runnable sampling job.

    For a token budget ``B = budget_fraction × corpus_tokens``, stratum
    s with target share t_s wants ``B·t_s`` tokens but only has
    ``avail_s``; its rate is ``min(1, B·t_s / avail_s)``.  A stratum
    without enough data saturates at rate 1 (the plan REPORTS the
    shortfall rather than silently re-normalizing — whether to
    re-weight survivors is a policy call, not an operator default).
    Strata absent from ``targets`` get rate 0.

    Plan shape: one map-side-combined aggregate over the docs (token
    counting is a scalar expression in the scan), then pure arithmetic
    over the strata-sized table; the total-budget term is a window over
    that tiny table, never the corpus.  Feed the resulting rates to
    ``text.stratified_hash_sample`` for the deterministic,
    engine-stable apply step."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    strata = docs.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("avail_tokens"),
    )
    target = F.lit(0.0)
    for s, w in sorted(targets.items()):
        target = F.when(
            F.col(stratum_col) == s, F.lit(float(w))
        ).otherwise(target)
    w_all = Window.partitionBy()
    budget = F.sum("avail_tokens").over(w_all) * budget_fraction
    want = budget * target
    rate = F.least(F.lit(1.0), want / F.col("avail_tokens"))
    return strata.select(
        stratum_col,
        "n_docs",
        "avail_tokens",
        F.round(target, 4).alias("target_share"),
        F.round(want, 2).alias("want_tokens"),
        F.round(rate, 4).alias("sample_rate"),
        F.round(
            F.least(want, F.col("avail_tokens").cast("double")), 2
        ).alias("expect_tokens"),
        (want > F.col("avail_tokens")).alias("short"),
    )


# --- DSIR: data selection via importance resampling -----------------------

def _dsir_bucket(gram: Column, buckets: int) -> Column:
    """md5-derived gram bucket — engine-stable (same contract as
    text.hash_sample_bucket; Spark and the DuckDB oracle agree
    bit-for-bit, which Spark's murmur `hash()` would not)."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10) \
        .cast("long") % buckets


def dsir_gram_buckets(text_col: str = "text",
                      buckets: int = 4096) -> Column:
    """Hashed n-gram feature buckets per document — unigrams + bigrams
    of the normalized tokenizer, WITH multiplicity (DSIR weights sum
    over gram instances, unlike the dedup tier's distinct shingles)."""
    from garmadon_spark.operators.dedup import _sliding_zip, tokens

    toks = tokens(text_col)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            _sliding_zip(toks, 2, m),
            lambda s: F.concat_ws(" ", s["0"], s["1"]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bigrams), lambda g: _dsir_bucket(g, buckets)
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """The DSIR importance model (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public paper): hashed
    n-gram bag-of-words distributions for the TARGET corpus (what you
    want more of) and the RAW corpus, returned as a ``buckets``-row
    (bkt, log_ratio) table with add-``smoothing`` estimation:

        log_ratio[b] = ln p̂_target[b] − ln p̂_raw[b]

    Plan: two explode→count aggregates (map-side combined; the shuffle
    key space is ``buckets``, never tokens), each run ONCE and collected
    — the counts are model-sized (≤ ``buckets`` integer rows), so they
    come back as literal tables instead of live subtrees (r14: the
    previous shape evaluated each full explode→count TWICE — once for
    its total's ``.first()`` and again inside the ratio join).  Totals
    are exact integer sums driver-side; the log-ratio arithmetic stays
    a JVM expression over the literal counts, so results are
    bit-identical.  The result is model-sized — broadcast it."""
    def bucket_counts(df: DataFrame) -> list:
        return (
            df.select(
                F.explode(dsir_gram_buckets(text_col, buckets))
                .alias("bkt")
            )
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )

    spark = raw.sparkSession
    # the two model builds are independent read-only jobs over disjoint
    # corpora — overlap them (guide §2.6) so the raw side back-fills
    # the target side's stage tail
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        tc_f = pool.submit(bucket_counts, target)
        rc_rows = bucket_counts(raw)
        tc_rows = tc_f.result()
    t_total = sum(r.c for r in tc_rows)
    q_total = sum(r.c for r in rc_rows)
    tc = spark.createDataFrame(
        [(int(r.bkt), int(r.c)) for r in tc_rows], "bkt long, ct long"
    )
    rc = spark.createDataFrame(
        [(int(r.bkt), int(r.c)) for r in rc_rows], "bkt long, c long"
    )
    s = float(smoothing)
    return (
        rc.join(tc, "bkt", "left")
        .select(
            "bkt",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + s)
                      / (t_total + s * buckets))
                - F.log((F.col("c") + s) / (q_total + s * buckets))
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weight over ``raw``: the sum of
    ``log_ratio`` over the document's gram instances.  High weight ⇒
    the document looks like the target distribution — the principled
    replacement for hand-tuned quality thresholds when curating toward
    a reference corpus (feed the weights to ``text.weighted_sample``
    for the distributed Gumbel-top-k selection step).

    Plan shape at 100 TB: the ratio table is model-sized (``buckets``
    rows) and broadcast; the explode→join runs map-side; the per-doc
    sum's map-side combine reduces each partition to ~one row per doc
    BEFORE the doc-keyed shuffle (explode preserves row locality), so
    the shuffle is corpus-rows-sized, not token-sized.  Docs with no
    grams keep weight 0.0."""
    ratios = dsir_log_ratios(raw, target, text_col, buckets, smoothing)
    per_doc = (
        raw.select(
            F.col(id_col),
            F.explode(dsir_gram_buckets(text_col, buckets)).alias("bkt"),
        )
        .join(F.broadcast(ratios), "bkt")
        .groupBy(id_col)
        .agg(F.round(F.sum("log_ratio"), 4).alias("log_weight"))
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .fillna({"log_weight": 0.0})
    )


# --- deterministic training shuffle ---------------------------------------

def shuffle_key(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Deterministic per-row shuffle key: md5 of (seed, id).  Stable
    across engines/runs/retries/partitionings — the property a training
    run needs to be RESUMABLE (epoch order must not depend on task
    scheduling, which rand()-based shuffles do)."""
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col)
                             .cast("string")))


def shard_of(key: Column, n_shards: int) -> Column:
    return (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Materialize one epoch's global pseudo-random order: every row
    gets a deterministic shuffle key, shards by its top bits, and each
    shard is written SORTED by the key — a data loader reading shards
    round-robin sees a reproducible global shuffle without any global
    sort (one hash-partition exchange + per-shard local sorts; at
    100 TB this is the epoch-shuffle job, re-run per seed)."""
    key = shuffle_key(id_col, seed)
    (
        df.withColumn("_skey", key)
        .withColumn("shard", shard_of(F.col("_skey"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_skey")
        .write.partitionBy("shard").mode("overwrite").parquet(path)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest of the deterministic shuffle: doc count,
    whitespace-token budget, and the key range (the loader's resume
    cursor space).  One map-side-combined aggregate."""
    key = shuffle_key(id_col, seed)
    n_tokens = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                               lambda t: t != ""))
    return (
        df.select(
            shard_of(key, n_shards).alias("shard"),
            key.alias("_skey"),
            n_tokens.alias("_ntok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.min("_skey").alias("first_key"),
            F.max("_skey").alias("last_key"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 128,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/embedding prep
    step between cleaning and the encoder: one row per (doc, window),
    windows ``chunk_chars`` wide starting every ``chunk_chars -
    overlap`` characters, the last window short.  Emits ``chunk_idx``
    (0-based window ordinal), ``chunk_start`` (0-based char offset),
    ``chunk_text``, ``chunk_len``, plus every non-text input column
    (chunk-level metadata rides along for the embedding job).

    Plan shape: ``F.sequence`` start offsets + one ``posexplode`` —
    a map-only scalar pass, NO shuffle, no Python; output rows ∝
    corpus chars / step, so the operator scales exactly like a linear
    scan at 100 TB.  NULL/empty documents yield no chunks (nothing to
    embed), matching the explode-side semantics of split_lines."""
    if chunk_chars < 1:
        raise ValueError("chunk_chars must be >= 1")
    if not 0 <= overlap < chunk_chars:
        raise ValueError("overlap must be in [0, chunk_chars)")
    step = chunk_chars - overlap
    n = F.length(F.col(text_col))
    others = [c for c in df.columns if c != text_col]
    return (
        df.filter(F.col(text_col).isNotNull() & (n > 0))
        .select(
            *others,
            F.col(text_col),
            F.posexplode(
                F.sequence(F.lit(0), n - F.lit(1), F.lit(step))
            ).alias("chunk_idx", "chunk_start"),
        )
        .withColumn(
            "chunk_text",
            F.col(text_col).substr(
                F.col("chunk_start") + F.lit(1), F.lit(chunk_chars)
            ),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
        .drop(text_col)
    )


def corpus_report(
    df: DataFrame,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """One-scan corpus datasheet per cohort — the summary a dataset
    owner publishes with a training mix: volume (docs, chars,
    whitespace tokens), exact-duplication rate (distinct text hashes vs
    rows), and length shape (mean tokens, median chars).  Everything is
    a scalar expression feeding ONE map-side-combined aggregate: a
    single linear scan + one cohort-keyed shuffle.

    ``exact`` picks the distinct-count/median engine.  True (the
    verification gate): exact count_distinct over md5 — the partial
    aggregate still carries one row per distinct hash (16 B each,
    never text) through the shuffle.  False (the 100 TB path): HLL++
    and an approximate median, making the shuffle rows COHORT-sized —
    a fixed-size sketch per cohort — at ~1-2 % distinct-count error;
    a datasheet tolerates that, an exact-dedup job does not (it uses
    operators/dedup.py)."""
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                           lambda t: t != ""))
    chars = F.length(F.col(text_col))
    if exact:
        distinct = F.count_distinct("_h")
        median = F.expr("percentile(_chars, 0.5)")
    else:
        distinct = F.approx_count_distinct("_h", rsd=0.01)
        median = F.expr("percentile_approx(_chars, 0.5)")
    return (
        df.select(
            *group_cols,
            chars.alias("_chars"),
            toks.alias("_toks"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            distinct.alias("n_distinct_texts"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - distinct / F.count(F.lit(1)),
                ), 4
            ).alias("dup_ratio"),
            F.sum("_chars").alias("total_chars"),
            F.sum("_toks").alias("total_tokens"),
            F.round(F.avg("_toks"), 2).alias("mean_tokens"),
            F.round(median, 1).alias("median_chars"),
        )
    )


# --- incremental corpus datasheet (mergeable rollup form) -----------------
#
# corpus_report answers "what is in this corpus" with one scan; a 100 TB
# corpus that grows by daily increments must not rescan history per
# refresh.  The datasheet state is a MERGEABLE rollup at
# (cohort, char_bin) grain: scalar partials (docs/chars/tokens — sums),
# an HLL sketch per cell for the distinct-text term (union-mergeable,
# the same engine as sinks/rollup.build_distinct_rollup), and the bin
# histogram doubling as the median engine (bin-walk interpolation, the
# ev_hist_quantile estimator).  Folding an increment touches only the
# cohorts it contains; serving reads cohort×bins rows — kilobytes.

REPORT_CHAR_BIN = 64
REPORT_HLL_LG_K = 12
# corpus_report_stream keeps only this many newest commit markers —
# a committed fold can never replay, so old markers are dead weight
_REPORT_RETAIN_MARKERS = 3


def corpus_report_partials(
    df: DataFrame,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    char_bin: int = REPORT_CHAR_BIN,
    lg_k: int = REPORT_HLL_LG_K,
) -> DataFrame:
    """One increment's datasheet partials: one linear scan + one
    (cohort, char_bin)-keyed aggregate.  Every column is mergeable —
    sums, plus an HLL sketch of the text hashes (16 B hashes shuffle,
    never text; the merged sketch is what makes incremental
    distinct-counting possible at all: exact COUNT(DISTINCT) partials
    do not merge)."""
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                           lambda t: t != ""))
    return (
        df.select(
            *group_cols,
            F.length(F.col(text_col)).alias("_chars"),
            toks.alias("_toks"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .groupBy(
            *group_cols,
            F.floor(F.col("_chars") / char_bin).cast("long")
            .alias("char_bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_chars").alias("total_chars"),
            F.sum("_toks").alias("total_tokens"),
            F.hll_sketch_agg("_h", F.lit(lg_k)).alias("hll"),
        )
    )


def merge_report_partials(
    partials: DataFrame, group_cols: tuple = ("lang", "source")
) -> DataFrame:
    """Fold any union of partial sets back to one row per cell: sums
    sum, sketches union — the algebra that makes increments, replays
    of increments, and cross-shard merges all the same operation."""
    return partials.groupBy(*group_cols, "char_bin").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_chars").alias("total_chars"),
        F.sum("total_tokens").alias("total_tokens"),
        F.hll_union_agg("hll", F.lit(True)).alias("hll"),
    )


def maintain_corpus_report(
    spark,
    increment: DataFrame,
    path: str,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    char_bin: int = REPORT_CHAR_BIN,
    lg_k: int = REPORT_HLL_LG_K,
) -> list:
    """Fold one increment into the materialized datasheet state:
    dynamic partition overwrite of exactly the touched first-group
    partitions (lang), the sinks/rollup._fold_partials discipline with
    the cohort key in place of the day key.  Returns the touched
    partition values."""
    from garmadon_spark.sinks.rollup import _has_partitions

    inc = corpus_report_partials(
        increment, group_cols, text_col, char_bin, lg_k
    )
    part_col = group_cols[0]
    touched = [r[0] for r in inc.select(part_col).distinct().collect()]
    exists = _has_partitions(spark, path, part_col)
    if exists:
        existing = spark.read.parquet(path).filter(
            F.col(part_col).isin(touched)
        ).select(*inc.columns)
        merged = merge_report_partials(
            existing.unionByName(inc), group_cols
        )
    else:
        merged = inc
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition(part_col)
            .write.partitionBy(part_col)
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(touched)


def corpus_report_from_partials(
    partials: DataFrame,
    group_cols: tuple = ("lang", "source"),
    char_bin: int = REPORT_CHAR_BIN,
) -> DataFrame:
    """Serve the corpus_report datasheet shape from the merged state:
    one aggregate over cohort×bins rows (never the corpus).  The
    distinct term is the HLL union estimate (~1.6 % rsd at lg_k=12 —
    the documented 100 TB trade corpus_report(exact=False) makes); the
    median is the bin-walk interpolation (within char_bin of exact —
    the ev_hist_quantile error contract)."""
    from garmadon_spark.sinks.rollup import histogram_quantile

    totals = partials.groupBy(*group_cols).agg(
        F.sum("n_docs").alias("n_docs"),
        F.hll_sketch_estimate(
            F.hll_union_agg("hll", F.lit(True))
        ).alias("n_distinct_texts"),
        F.sum("total_chars").alias("total_chars"),
        F.sum("total_tokens").alias("total_tokens"),
    )
    med = histogram_quantile(
        partials.select(
            *group_cols,
            F.col("char_bin").alias("bin"),
            F.col("n_docs").alias("cnt"),
        ),
        0.5, bin_width=float(char_bin), group_cols=group_cols,
        per_bucket=False,
    ).withColumnRenamed("p50_est", "median_chars_est")
    return (
        totals.join(med, list(group_cols))
        .select(
            *group_cols,
            "n_docs",
            "n_distinct_texts",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0)
                    - F.col("n_distinct_texts") / F.col("n_docs"),
                ), 4
            ).alias("dup_ratio"),
            "total_chars",
            "total_tokens",
            F.round(
                F.col("total_tokens") / F.col("n_docs"), 2
            ).alias("mean_tokens"),
            F.round("median_chars_est", 1).alias("median_chars_est"),
        )
    )


def corpus_report_stream(
    docs: DataFrame,
    path: str,
    checkpoint: str,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    char_bin: int = REPORT_CHAR_BIN,
    lg_k: int = REPORT_HLL_LG_K,
):
    """The continuous datasheet: every micro-batch of documents folds
    into the materialized state via maintain_corpus_report inside
    foreachBatch — the rollup_query idiom, with the same run-scoped
    marker protocol (``_report_batches``): a replayed committed batch
    short-circuits, and a FRESH checkpoint over another incarnation's
    fold chain is REFUSED (re-numbered batches would re-fold counted
    documents).  Same honest window as every merge sink here: a crash
    BETWEEN the partition commit and the marker write can double-fold
    one batch; closing it needs a transactional table format (the
    documented production swap).  Markers older than the newest
    ``_REPORT_RETAIN_MARKERS`` are pruned after each commit — a
    committed batch can never replay (the checkpoint committed past
    it; Structured Streaming only ever re-runs the LAST uncommitted
    batch), so an old marker's only job is done and the directory
    stays bounded instead of growing O(total batches ever), the same
    retention maintain_freq_items_stream applies.  The newest marker
    always survives, which is all _refuse_foreign_chain's O(1)
    own-vs-foreign read needs.  Returns the (unstarted,
    availableNow-triggered) writer."""
    from garmadon_spark.sinks.rollup import (
        _checkpoint_run_id,
        _hadoop_fs,
        _list_markers,
        _marker_current,
        _refuse_foreign_chain,
        _write_marker,
    )

    cache: dict = {}

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        if "run" not in cache:
            cache["run"] = _checkpoint_run_id(sess, checkpoint)
            _refuse_foreign_chain(
                sess, f"{path}/_report_batches", cache["run"],
                "resume its original checkpoint or rebuild the "
                "datasheet state",
            )
        marker = f"{path}/_report_batches/{batch_id}.done"
        if _marker_current(sess, marker, cache["run"]):
            return
        maintain_corpus_report(
            sess, batch_df, path, group_cols, text_col, char_bin, lg_k
        )
        _write_marker(sess, marker, cache["run"])
        marked = []
        for m in _list_markers(sess, f"{path}/_report_batches"):
            stem = m.rsplit("/", 1)[-1][: -len(".done")]
            if stem.isdigit():
                marked.append(int(stem))
        for b in sorted(marked)[:-_REPORT_RETAIN_MARKERS]:
            fs, jp = _hadoop_fs(
                sess, f"{path}/_report_batches/{b}.done")
            fs.delete(jp, False)

    return (
        docs.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
    )
