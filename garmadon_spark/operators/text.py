"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (codegen'd, shuffle-free per doc) — at 100 TB
these run as map-only passes fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from garmadon_spark.operators.dedup import _hash64, tokens

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real deployments plug in fastText/cld3 via a pandas UDF; the operator
# contract (argmax over per-language evidence scores) is the same.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "with", "for", "on"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "un", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}


def lang_scores(text_col: str = "text") -> list[tuple[str, Column]]:
    toks = tokens(text_col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        )
        out.append((lang, hits))
    return out


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-evidence language ID: argmax of per-language distinct
    marker hits; 'und' (undetermined) when nothing matches.  Ties break
    by language code order (deterministic)."""
    scores = lang_scores(text_col)
    pred = F.lit("und")
    best = F.lit(0)
    for lang, s in sorted(scores, key=lambda p: p[0], reverse=True):
        pred = F.when(s >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    return df.withColumn("predicted_lang", pred)


WORD_RE = r"[A-Za-z]+"
NUM_RE = r"[0-9]+"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the max multiplicity of any value.  One aggregate() pass,
    O(n) per row after the O(n log n) sort — no explode, no shuffle:
    the distributed-groupBy alternative (explode → count → max) shuffles
    the whole token stream twice at 100 TB for a per-doc statistic."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(" ").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repeated-content concentration signals (the Gopher-style filter
    family): the fraction of the document taken by its most frequent
    token and most frequent bigram.  Boilerplate, keyword-stuffed, and
    generator-degenerate pages score high; prose scores low.

    Token and bigram arrays are staged through projections so each is
    computed once (CollapseProject would otherwise inline the split
    into every consumer)."""
    staged = df.select(
        "*", tokens(text_col).alias("_toks")
    ).select("*", F.size(F.col("_toks")).alias("_n"))
    blen = F.greatest(F.col("_n") - 1, F.lit(0))  # slice() rejects -1
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(F.col("_toks"), 1, blen),
            F.slice(F.col("_toks"), 2, blen),
        ),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )
    staged = staged.select("*", bigrams.alias("_bigrams"))
    n = F.col("_n")
    nb = F.size(F.col("_bigrams"))
    return staged.select(
        "*",
        F.col("_n").alias("n_tokens"),
        F.round(
            F.when(
                n > 0,
                _max_run(F.array_sort(F.col("_toks"))).cast("double") / n,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_token_frac"),
        F.round(
            F.when(
                nb > 0,
                _max_run(F.array_sort(F.col("_bigrams"))).cast("double") / nb,
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_bigram_frac"),
    ).drop("_toks", "_n", "_bigrams")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letters / digit runs / single punctuation) — the pre-tokenizer count
    that tracks LLM token budgets."""
    return df.select(
        "*",
        F.size(tokens(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).alias(
            "bpe_tokens"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring from cheap surface statistics:

    - mean word length (degenerate text skews extreme),
    - alpha ratio (letters / non-space chars),
    - stopword ratio (natural language has some),
    - repetition ratio (distinct tokens / tokens).

    score ∈ [0,1] = product of clamped component scores — monotone,
    explainable, and cheap enough to run inline with ingestion.

    The token array is staged through a projection and referenced as a
    column: four component ratios consume it, and a multiply-referenced
    non-cheap expression blocks CollapseProject from inlining — one
    tokenization per row instead of four."""
    staged = df.select("*", tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    text = F.col(text_col)
    n_nospace = F.length(F.regexp_replace(text, r"\s", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_distinct = F.size(F.array_distinct(toks))

    # second staging: the composite score references every ratio, and
    # ratios as materialized columns keep the generated code small (the
    # inlined form quintuples the expression tree and the whole-stage
    # codegen JIT cost dwarfs the actual row work)
    ratios = staged.select(
        *[c for c in df.columns],
        F.when(n_tok > 0, n_nospace / n_tok).otherwise(F.lit(0.0))
        .alias("_mean_wlen"),
        F.when(n_nospace > 0, n_alpha / n_nospace).otherwise(F.lit(0.0))
        .alias("_alpha"),
        F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
        .alias("_stop"),
        F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
        .alias("_rep"),
    )
    mean_wlen, alpha_ratio = F.col("_mean_wlen"), F.col("_alpha")
    stop_ratio, rep_ratio = F.col("_stop"), F.col("_rep")
    wlen_score = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0), F.lit(1.0) - F.abs(mean_wlen - F.lit(5.0)) / F.lit(5.0)),
    )
    score = F.round(
        wlen_score * alpha_ratio
        * F.least(F.lit(1.0), stop_ratio * F.lit(5.0) + F.lit(0.2))
        * rep_ratio,
        4,
    )
    return ratios.select(
        *[c for c in df.columns],
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(rep_ratio, 4).alias("repetition_ratio"),
        score.alias("quality_score"),
    )


# Gopher rule-set constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1 —
# public paper).  The stopword gate wants at least two DISTINCT members.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, App. A1.1)
    as ONE map-only pass of scalar expressions — no UDF, no shuffle; at
    100 TB this fuses into the scan exactly like ``quality_score``.

    Per-document stats plus one boolean per rule plus the conjunction:

    - word count within [min_words, max_words],
    - mean word length within [3, 10],
    - symbol-to-word ratio ('#' and ellipsis) < 0.1,
    - fraction of bullet-led lines < 0.9,
    - fraction of ellipsis-ended lines < 0.3,
    - fraction of words with an alphabetic character > 0.8,
    - at least 2 distinct stopwords present.

    Words are RAW whitespace tokens (not the lowercased/normalized
    dedup tokenizer): the paper's length and symbol statistics are
    case- and punctuation-faithful.  The word and line arrays are
    staged through a projection so each is computed once per row even
    though several rules consume them (CollapseProject would otherwise
    inline the split into every consumer).

    Input columns that collide with an emitted stat (e.g. a
    ``mean_word_len`` from an upstream ``quality_score``) are REPLACED,
    not duplicated — a chained frame stays referenceable by name."""
    emitted = {
        "n_words", "mean_word_len", "symbol_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "stopword_hits",
        "pass_word_count", "pass_mean_word_len", "pass_symbol_ratio",
        "pass_bullet_lines", "pass_ellipsis_lines", "pass_alpha_words",
        "pass_stopwords", "accepted",
    }
    passthrough = [c for c in df.columns if c not in emitted]
    text = F.col(text_col)
    staged = df.select(
        *passthrough,
        F.filter(F.split(text, r"\s+"), lambda t: t != "").alias("_words"),
        F.split(text, "\n").alias("_lines"),
    )
    words, lines = F.col("_words"), F.col("_lines")
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_wlen = F.aggregate(
        words, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("...")))) / F.lit(3)
        + F.length(text) - F.length(F.replace(text, F.lit("…")))
    )
    n_bullet_lines = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[•*-]"))
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    # ratios staged once: every rule boolean AND the emitted stat read
    # them, and keeping them as materialized columns keeps the codegen
    # tree linear in the rule count
    ratios = staged.select(
        *passthrough,
        n_words.alias("n_words"),
        F.when(n_words > 0, sum_wlen / n_words).otherwise(F.lit(0.0))
        .alias("_mwl"),
        F.when(n_words > 0, (n_hash + n_ellipsis) / n_words)
        .otherwise(F.lit(0.0)).alias("_sym"),
        (n_bullet_lines / n_lines).alias("_bullet"),
        (n_ellipsis_lines / n_lines).alias("_ell"),
        F.when(n_words > 0, n_alpha_words / n_words).otherwise(F.lit(0.0))
        .alias("_alpha"),
        stop_hits.alias("stopword_hits"),
    )
    mwl, sym = F.col("_mwl"), F.col("_sym")
    bullet, ell, alpha = F.col("_bullet"), F.col("_ell"), F.col("_alpha")
    rules = {
        "pass_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "pass_mean_word_len": (mwl >= 3.0) & (mwl <= 10.0),
        "pass_symbol_ratio": sym < 0.1,
        "pass_bullet_lines": bullet < 0.9,
        "pass_ellipsis_lines": ell < 0.3,
        "pass_alpha_words": alpha > 0.8,
        "pass_stopwords": F.col("stopword_hits") >= 2,
    }
    accepted = None
    for expr in rules.values():
        accepted = expr if accepted is None else (accepted & expr)
    return ratios.select(
        *passthrough,
        "n_words",
        F.round(mwl, 4).alias("mean_word_len"),
        F.round(sym, 4).alias("symbol_ratio"),
        F.round(bullet, 4).alias("bullet_line_frac"),
        F.round(ell, 4).alias("ellipsis_line_frac"),
        F.round(alpha, 4).alias("alpha_word_frac"),
        "stopword_hits",
        *[expr.alias(name) for name, expr in rules.items()],
        accepted.alias("accepted"),
    )


def hash_sample_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic sampling bucket in [0, buckets): md5-derived, so
    the assignment is stable across engines, runs, partitionings and
    retries — the property `df.sample()` (rng per task) cannot give.
    Sampling at rate r = `hash_sample_bucket(key) < r * buckets`;
    supersets are monotone (raising r keeps every previously sampled
    row), which makes reproducible dataset growth curves possible."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("long") % buckets


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    rates: dict[str, float],
    stratum_col: str,
    default_rate: float = 0.0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones).  Map-only — a filter over the
    hash bucket, no shuffle, folds into the scan.

    Resolution is 1/buckets: a rate is effectively rounded UP to the
    next bucket boundary (the float threshold keeps a 0.004 rate from
    silently truncating to ZERO and dropping its stratum — the r6
    review finding).  For mixture-plan rates below 1 %, pass a larger
    ``buckets`` (e.g. 10_000); supersets stay monotone for a fixed
    bucket count."""
    threshold = F.lit(float(default_rate * buckets))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(float(rate * buckets))
        ).otherwise(threshold)
    return df.filter(hash_sample_bucket(F.col(key_col), buckets) < threshold)


def stratified_topn(
    df: DataFrame,
    key_col: str,
    stratum_col,
    n: int,
    seed: int = 0,
) -> DataFrame:
    """EXACT-count per-stratum sampling: the n rows per stratum whose
    md5(seed, key) ranks lowest — the eval-set construction spec
    ("exactly 500 docs per language") that rate-based
    ``stratified_hash_sample`` can only hit in expectation.
    Deterministic for a fixed (corpus, seed): re-runs, supersets of
    strata, and the DuckDB oracle all agree row-for-row.

    ``key_col`` must uniquely identify rows (the standard sampling-key
    contract, same as stratified_hash_sample): duplicate or NULL keys
    collapse to one rank position whose internal order is
    plan-dependent, so the draw would no longer be reproducible
    row-for-row when the cutoff lands inside the tie.

    ``stratum_col`` may be a column name or a tuple of names.
    Plan: one hash-partitioned window per stratum (rank over the md5
    key) — a single shuffle keyed on the stratum, no global sort;
    at 100 TB the stratum key's cardinality bounds the reduce side
    exactly like any groupBy.  Skewed mega-strata pay one task unless
    pre-filtered with ``stratified_hash_sample`` at a few × n/|stratum|
    first — the standard two-step for exact-k from a giant group."""
    from pyspark.sql import Window

    strata = ([stratum_col] if isinstance(stratum_col, str)
              else list(stratum_col))
    rk = F.md5(F.concat_ws("\x1f", F.lit(str(seed)),
                           F.col(key_col).cast("string")))
    rank_col = "__stratified_topn_rank"   # never clobber caller columns
    w = Window.partitionBy(*strata).orderBy(rk.asc(),
                                            F.col(key_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
        .drop(rank_col)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Weight-proportional sampling without replacement, deterministic:
    Efraimidis–Spirakis A-ES — each row draws a stable uniform u from
    its key hash and ranks by u^(1/w); the top-k per group is a
    weighted sample (heavier rows win proportionally more often).
    Hash-derived u (not rng) keeps the sample identical across engines,
    runs and retries, same contract as hash_sample_bucket.

    Plan: scalar key expression + one top-k per group (TakeOrdered when
    ungrouped, a tiny window shuffle when grouped) — no full sort.  The
    standard pick for 'sample 10 M docs proportional to length' on a
    corpus too big to rand()-and-sort.  Weights must be POSITIVE
    (u^(1/w) is undefined at w ≤ 0)."""
    # u in (0, 1]: 8 md5 hex chars -> [0, 2^32) -> shift to avoid u=0
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
               16, 10).cast("double") + 1.0
    ) / float(2 ** 32)
    key = F.pow(u, 1.0 / weight_col)
    scored = df.withColumn("_es_key", F.round(key, 12))
    if not group_cols:
        # global top-k plans as TakeOrderedAndProject (per-partition
        # heap + driver merge of k rows) — NOT a single-partition
        # window sort of the whole input (the round-5 advisor found
        # the old Window.partitionBy() path contradicting this
        # docstring's scale contract)
        return (
            scored.orderBy(F.desc("_es_key"), F.asc(key_col))
            .limit(k)
            .drop("_es_key")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("_es_key"), F.asc(key_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
    bias: float = -0.1,
    weights: list[float] | None = None,
    out_col: str = "quality_prob",
    keep_cols: bool = False,
) -> DataFrame:
    """fastText-style linear text classifier, scored entirely JVM-side:
    tokens hash into ``n_features`` buckets, the document's feature
    vector is the MEAN of its buckets' weights, and the score is
    ``sigmoid(bias + mean)`` — the architecture of the quality/toxicity
    gates production corpus pipelines run over every document (CCNet's
    fastText quality filter, RefinedWeb's URL+content classifiers).

    The model lives in ONE literal array indexed by ``element_at`` —
    model inference as a scalar expression: no UDF, no explode, no
    shuffle, fused into the scan; at 100 TB this is a map-only pass
    like the other quality signals.  For models too wide for a literal
    (fastText defaults to 2^21 buckets) the same plan swaps the array
    for a 1-row broadcast join, the doc_perplexity pattern.

    The default ``weights`` derive deterministically from the bucket id
    ((j mod 7 − 3)/10) — a stand-in for trained parameters with the
    full plumbing real weights would use.  The bucket hash is
    md5-derived (engine-stable, the hash_sample_bucket contract), so
    scores reproduce across engines/runs/retries."""
    if weights is None:
        weights = [(j % 7 - 3) / 10.0 for j in range(n_features)]
    if len(weights) != n_features:
        raise ValueError(
            f"weights length {len(weights)} != n_features {n_features}"
        )
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = F.split(F.lower(F.col(text_col)), " ")

    def bucket(t: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % n_features
        )

    tok_sum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(
            warr, (bucket(t) + 1).cast("int")
        ),
    )
    mean_w = tok_sum / F.greatest(F.size(toks), F.lit(1))
    score = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(bias) + mean_w))
    )
    if keep_cols:
        # chainable form: other scalar quality tiers compose in the
        # same single scan (see doc_quality_agreement)
        return df.select("*", F.round(score, 4).alias(out_col))
    return df.select(
        id_col, F.round(score, 4).alias(out_col)
    )


def fingerprint_winnow(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Document fingerprinting by winnowing (MOSS-style): rolling k-gram
    hashes, keep the min hash of every sliding window → a compact,
    position-robust fingerprint set.  Array expressions only: the
    windowed-min is computed over arrays_zip'd shifted slices (see
    dedup._sliding_zip for why — per-element lambda re-evaluation), no
    explode until the final set."""
    from garmadon_spark.operators.dedup import _sliding_zip

    toks = tokens(text_col)
    n_kgrams = F.greatest(F.size(toks) - k + 1, F.lit(0))
    kgram_hashes = F.transform(
        _sliding_zip(toks, k, n_kgrams),
        lambda s: _hash64(F.concat_ws(" ", *[s[str(i)] for i in range(k)])),
    )
    staged = df.select(F.col(id_col), kgram_hashes.alias("_kh"))
    kh = F.col("_kh")
    n_windows = F.greatest(F.size(kh) - window + 1, F.lit(0))
    fingerprints = F.array_distinct(
        F.transform(
            _sliding_zip(kh, window, n_windows),
            lambda s: F.least(*[s[str(i)] for i in range(window)]),
        )
    )
    return staged.select(
        F.col(id_col),
        F.when(F.size(kh) > 0, fingerprints)
        .otherwise(F.array().cast("array<long>"))
        .alias("fingerprints"),
    )


def fingerprint_overlap(
    fps: DataFrame, id_col: str = "doc_id", min_common: int = 2,
    max_doc_freq: int = 20,
) -> DataFrame:
    """Candidate near-dup pairs sharing ≥ min_common winnowed
    fingerprints — explode + self-join on the fingerprint value.

    Fingerprints occurring in > max_doc_freq documents are dropped
    (MOSS's "ignore overly common fingerprints"): a fingerprint shared by
    f docs contributes O(f²) pairs, so without the cap a low-diversity
    corpus degrades to all-pairs.  Plan shape: explode → one groupBy(fp)
    collecting the (capped) doc bucket → in-bucket pair expansion → one
    groupBy(pair) — upstream fingerprints are computed once (no
    self-join), and the frequency cap is a `size()` filter on the
    collected bucket instead of a window function."""
    from garmadon_spark.operators.dedup import bucket_pairs, explode_computed

    ex = explode_computed(
        fps, F.col("fingerprints"), "fp", [F.col(id_col).alias("doc")]
    )
    pairs = bucket_pairs(ex, ["fp"], "doc", max_bucket=max_doc_freq)
    return (
        pairs.groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common_fingerprints"))
        .filter(F.col("common_fingerprints") >= min_common)
    )


# --- bigram-LM perplexity scoring -----------------------------------------

def bigram_instances(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One row per bigram INSTANCE — (id, w1, w2) with multiplicity,
    unlike dedup.shingles which distincts.  Tokens staged through a
    projection (computed once) and the bigram array exploded through
    explode_computed so the tokenize never duplicates below an
    exchange."""
    from garmadon_spark.operators.dedup import explode_computed

    staged = df.select(id_col, tokens(text_col).alias("_toks"))
    staged = staged.select("*", F.size(F.col("_toks")).alias("_n"))
    blen = F.greatest(F.col("_n") - 1, F.lit(0))
    bg = F.arrays_zip(
        F.slice(F.col("_toks"), 1, blen),
        F.slice(F.col("_toks"), 2, blen),
    )
    return explode_computed(staged, bg, "_bg", [id_col]).select(
        id_col,
        F.col("_bg")["0"].alias("w1"),
        F.col("_bg")["1"].alias("w2"),
    )


def perplexity_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy / perplexity under an add-1-smoothed
    bigram LM trained on the corpus itself — the CCNet-style quality
    signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data", LREC 2020): fluent prose scores low,
    boilerplate/gibberish scores high.

    Model: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), c(·) counted over the
    corpus bigram table, V = distinct tokens participating in bigrams.
    Docs with <2 tokens have no bigrams and are not scored.

    Shuffle shape: the bigram table is built once (persisted — three
    consumers), two count aggregates with map-side combine, one join
    back on (w1,w2) + one on w1, one per-doc aggregate.  At 100 TB the
    production variant prunes the model to the top-K n-grams (coverage
    saturates fast under Zipf) and broadcasts it, turning the score pass
    into a map-only scan; the exact formulation here keeps the DuckDB
    oracle bit-for-bit checkable."""
    bg = bigram_instances(df, text_col, id_col).persist()
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        bg.select(F.col("w1").alias("tok"))
        .union(bg.select(F.col("w2").alias("tok")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    logp = F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg(logp)).alias("_ce"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("_ce"), 4).alias("cross_entropy"),
            F.round(F.exp(F.col("_ce")), 2).alias("ppl"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 keyword relevance against a fixed query — the exact
    lexical-retrieval complement to the ANN tier (decontamination
    lookups, curation-by-keyword, eval-set mining all need term search,
    not embeddings).  Uses the Lucene-style non-negative idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``.

    Plan shape at 100 TB: corpus statistics (N, avg doc length, per-term
    document frequencies) are ONE map-side-combined aggregate collapsing
    to a single driver row — |query|+2 scalars that ride the scoring
    expression as literals.  Scoring itself is a map-only scalar pass
    over the scan (per-term tf via array filters on the staged token
    array); only matching docs (score > 0) are emitted.  No shuffle
    anywhere, no inverted index to maintain — Parquet + codegen IS the
    index for batch-scale retrieval."""
    toks_col = tokens(text_col)
    staged = df.select(id_col, toks_col.alias("_toks"))
    toks = F.col("_toks")

    def term_freq(term: str) -> Column:
        # one-arg lambda via closure: a two-parameter lambda (even with
        # a default) is called by Spark as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    stats_row = staged.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(toks)).alias("avgdl"),
        *[
            F.sum((term_freq(t) > 0).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ],
    ).first()
    n_docs = stats_row["n"] or 0
    avgdl = float(stats_row["avgdl"] or 1.0)
    import math

    idf = [
        math.log(1.0 + (n_docs - stats_row[f"df_{i}"] + 0.5)
                 / (stats_row[f"df_{i}"] + 0.5))
        for i in range(len(query_terms))
    ]
    dl = F.size(toks)
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        tf = term_freq(t)
        score = score + F.lit(idf[i]) * (
            tf.cast("double") * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * dl / F.lit(avgdl)))
        )
    return (
        staged.select(id_col, F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )


def bm25_scores_batch(
    df: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
    persist_tf: bool = True,
) -> DataFrame:
    """Okapi BM25 against a TABLE of queries — the shape batch
    decontamination actually needs (thousands of eval-set queries
    scored in one job); the single-query ``bm25_scores`` would re-scan
    the corpus per query.  ``queries``: (query_id, terms array<string>)
    rows; terms are matched against the same normalized tokenizer as
    the corpus.  Output: (query_id, doc_id, bm25) for every doc sharing
    ≥1 term with the query.  Same Lucene non-negative idf as the
    single-query form.

    Plan shape at 100 TB — no cartesian anywhere; the corpus meets the
    query set only through term-keyed equi-joins:

    1. corpus scalars (N, avgdl): ONE map-side-combined aggregate
       collapsing to a single driver row (two literals);
    2. the DISTINCT query-term vocabulary (model-sized) broadcast
       semi-joins the exploded corpus postings, so non-query terms die
       in the map stage — the corpus never shuffles rows that can't
       score;
    3. per-(doc, term) tf: the plan's ONE corpus-candidate-rows
       shuffle (groupBy doc+term, map-side combined);
    4. per-term document frequency from the tf table (query-vocabulary
       sized) becomes the idf side, broadcast;
    5. (term → query) broadcast join + groupBy (query, doc) sum —
       candidate-rows sized.
    """
    # a term repeated in one query contributes once PER OCCURRENCE in
    # the single-query form (the scoring loop runs per list element),
    # so the batch form carries the multiplicity as a weight — plain
    # distinct() would halve the score of (q, ["fox", "fox"])
    q_terms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(terms_col).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("_w"))
    )
    vocab = q_terms.select("term").distinct()

    staged = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    )
    stats = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size("_toks")).alias("avgdl"),
    ).first()
    n_docs = stats["n"] or 0
    avgdl = float(stats["avgdl"] or 1.0)
    import math

    assert math.isfinite(avgdl), "corpus avgdl must be finite"

    postings = staged.select(
        "doc_id",
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    ).join(F.broadcast(vocab), "term", "left_semi")
    from pyspark import StorageLevel

    # the (doc, term) tf table feeds TWO plan branches (the idf
    # broadcast build and the scoring join); un-persisted, each branch
    # re-tokenizes and re-explodes the whole corpus.  tf is
    # candidate-rows sized (docs sharing >=1 query term x query
    # vocabulary), never corpus-sized — release via the returned
    # frame's _gs_unpersist
    tf = postings.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if persist_tf:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(q_terms), "term")
        .select(
            "query_id", "doc_id",
            (
                F.col("_w") * F.col("idf")
                * F.col("tf").cast("double") * (k1 + 1.0)
                / (F.col("tf")
                   + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("_s"),
        )
    )
    out = (
        per_term.groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_s"), 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )
    out._gs_unpersist = tf.unpersist if persist_tf else (lambda: None)
    return out


def train_bigram_lm(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> None:
    """Materialize the add-1-smoothed bigram LM the CCNet recipe
    actually uses (Wenzek et al., LREC 2020): train ONCE on a
    reference corpus (their Wikipedia), then score every candidate
    crawl against it with ``perplexity_from_model`` — unlike
    ``perplexity_scores``, which self-trains per call and exists for
    the bit-exact oracle.

    Writes ``{path}/c12`` (bigram counts), ``{path}/c1`` (unigram
    left-context counts) and ``{path}/meta`` (1 row: the vocabulary
    size V counted BEFORE any pruning, so smoothing stays the trained
    distribution's).  ``top_k`` prunes each table to its K
    highest-count rows (count desc, token tie-break — deterministic):
    under Zipf, coverage saturates fast, and a pruned model is
    BROADCAST-sized, turning the score pass into a map-side join
    instead of two shuffles.  Dropped rows fall back to the same
    smoothing floor as unseen n-grams — the model degrades gracefully,
    never wrongly."""
    bg = bigram_instances(df, text_col, id_col).persist()
    try:
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
        v = (
            bg.select(F.col("w1").alias("tok"))
            .union(bg.select(F.col("w2").alias("tok")))
            .distinct()
            .count()
        )
        if top_k is not None:
            c1 = c1.orderBy(F.desc("c1"), F.asc("w1")).limit(top_k)
            # anti-prune: a bigram whose LEFT CONTEXT was pruned must
            # go too, or scoring computes P=(c12+1)/(0+V) — an inflated
            # (possibly >1) probability that UNDERSTATES perplexity and
            # lets junk under the filter.  With c12 ⊆ surviving c1,
            # every retained bigram scores against its real context
            # count and everything else degrades to the smoothing floor
            c12 = (
                c12.join(F.broadcast(c1.select("w1")), "w1", "left_semi")
                .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
                .limit(top_k)
            )
        c12.write.mode("overwrite").parquet(f"{path}/c12")
        c1.write.mode("overwrite").parquet(f"{path}/c1")
        spark = df.sparkSession
        spark.createDataFrame([(int(v),)], "v long").write.mode(
            "overwrite"
        ).parquet(f"{path}/meta")
    finally:
        bg.unpersist()


def perplexity_from_model(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score documents against a PERSISTED bigram LM (train_bigram_lm)
    — the cross-corpus CCNet shape.  Out-of-model n-grams (unseen at
    training, or pruned) smooth to c=0: P = (0+1)/(0+V), so a
    candidate corpus with novel vocabulary scores HIGH perplexity
    instead of erroring — exactly the signal the filter wants.

    Same output columns as perplexity_scores.  ``broadcast_model``
    hints both model joins broadcast (correct whenever the model was
    top_k-pruned to broadcast size) — the score pass then never
    shuffles the candidate corpus' bigrams."""
    spark = df.sparkSession
    c12 = spark.read.parquet(f"{path}/c12")
    c1 = spark.read.parquet(f"{path}/c1")
    if broadcast_model:
        c12, c1 = F.broadcast(c12), F.broadcast(c1)
    v = spark.read.parquet(f"{path}/meta").head().v
    bg = bigram_instances(df, text_col, id_col)
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(v)))
    )
    return (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg(logp)).alias("_ce"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("_ce"), 4).alias("cross_entropy"),
            F.round(F.exp(F.col("_ce")), 2).alias("ppl"),
        )
    )
