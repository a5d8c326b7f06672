"""LLM-training-data pipeline operators over `documents` / `embeddings`.

Beyond the reference's own surface (BASELINE.json north star): dedup,
similarity search, text analysis — each as a declared query with a DuckDB
oracle where SQL-expressible.  The scale-path variants (MinHash-LSH,
SimHash, IVF) live in garmadon_spark.operators.dedup / .similarity and are
registered as rows-only checks.

Scale notes: all text statistics are single-pass, shuffle-free (scalar
expressions) or one-shuffle (groupBy).  Brute-force kNN against ONE query
vector is a map-only pass + TakeOrdered(k) — it scales linearly and never
shuffles the corpus; the all-pairs variants are where LSH bucketing comes
in (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from garmadon_spark.session import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# --- document fingerprinting ---------------------------------------------

def doc_fingerprint(spark, sf_dir):
    """Content-hash fingerprint per document (exact-dedup key).  md5 is
    JVM-side codegen; at 100 TB this is the map stage of exact dedup."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.col("text")).alias("fingerprint"),
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias(
            "normalized_fingerprint"
        ),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(text) AS fingerprint,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS normalized_fingerprint
FROM documents
"""


# --- exact dedup ----------------------------------------------------------

def doc_exact_dedup(spark, sf_dir):
    """Exact duplicate groups by normalized content hash — hash-groupBy,
    the canonical first dedup pass.  One shuffle on the 128-bit hash
    (uniform ⇒ no skew).  Returns groups with >1 member."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias(
                "content_hash"
            ),
            "doc_id",
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


DOC_EXACT_DEDUP_SQL = """
SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS content_hash,
       COUNT(*) AS dup_count,
       MIN(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
"""


# --- text statistics ------------------------------------------------------

def doc_token_stats(spark, sf_dir):
    """Whitespace token counting + char stats per document — the basic
    quality-scoring inputs.  Pure scalar expressions, zero shuffles."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.length("text").alias("text_len"),
        F.col("n_chars").alias("n_chars"),
    )


DOC_TOKEN_STATS_SQL = """
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS text_len,
       n_chars
FROM documents
"""


def doc_lang_stats(spark, sf_dir):
    """Corpus composition per language/source — terms bucket + metrics."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


DOC_LANG_STATS_SQL = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       SUM(n_chars) AS total_chars
FROM documents
GROUP BY lang, source
"""


def doc_top_tokens(spark, sf_dir):
    """Corpus-wide token frequency top-20 — explode + count + top-k.
    At scale: map-side combine keeps the exploded shuffle proportional to
    *distinct* tokens per partition, not total tokens."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


DOC_TOP_TOKENS_SQL = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""


# --- embeddings -----------------------------------------------------------

def emb_norms(spark, sf_dir):
    """L2 norms per embedding — `F.aggregate` over array<float>, JVM-side
    (no Python).  Map-only, zero shuffles."""
    return _embs(spark, sf_dir).select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            4,
        ).alias("l2_norm"),
    )


EMB_NORMS_SQL = """
SELECT vec_id, label,
       ROUND(sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS l2_norm
FROM (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings)
GROUP BY vec_id, label
"""


def emb_knn_bruteforce(spark, sf_dir, query_vec_id: int = 0, k: int = 10):
    """Brute-force cosine top-k against one query vector — the ANN
    baseline.  The query vector is fetched driver-side (single-row lookup)
    and inlined as a literal array, so the corpus pass is map-only +
    TakeOrdered(k): linear scan, no shuffle, embarrassingly parallel at
    100 TB.  The bucketed/IVF variant lives in operators/similarity.py.
    """
    embs = _embs(spark, sf_dir)
    qrow = embs.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    qvec = [float(x) for x in qrow[0]]
    q = F.array(*[F.lit(x) for x in qvec])
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), q, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    qnorm = sum(x * x for x in qvec) ** 0.5
    return (
        embs.filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            "label",
            F.round(dot / (norm * F.lit(qnorm)), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


EMB_KNN_BRUTEFORCE_SQL = """
WITH q AS (
    SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), qn AS (
    SELECT sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qnorm
    FROM (SELECT unnest(qe) AS x FROM q)
), pairs AS (
    SELECT e.vec_id, e.label,
           CAST(unnest(e.embedding) AS DOUBLE) AS x,
           CAST(unnest(q.qe) AS DOUBLE) AS qx
    FROM embeddings e, q
    WHERE e.vec_id <> 0
), scored AS (
    SELECT vec_id, label,
           SUM(x * qx) AS dot,
           sqrt(SUM(x * x)) AS norm
    FROM pairs
    GROUP BY vec_id, label
)
SELECT vec_id, label,
       ROUND(dot / (norm * (SELECT qnorm FROM qn)), 4) AS cosine
FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def emb_label_centroid_dist(spark, sf_dir):
    """Average vector norm and count per label — groupBy over a scalar
    derived from the array column (one shuffle on a tiny key space)."""
    embs = _embs(spark, sf_dir)
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        embs.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("l2"), 4).alias("avg_norm"),
        )
    )


EMB_LABEL_CENTROID_DIST_SQL = """
WITH norms AS (
    SELECT vec_id, label,
           sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS l2
    FROM (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings)
    GROUP BY vec_id, label
)
SELECT label, COUNT(*) AS n_vectors, ROUND(AVG(l2), 4) AS avg_norm
FROM norms
GROUP BY label
"""


QUERIES = {
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "doc_exact_dedup": (doc_exact_dedup, DOC_EXACT_DEDUP_SQL),
    "doc_token_stats": (doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_lang_stats": (doc_lang_stats, DOC_LANG_STATS_SQL),
    "doc_top_tokens": (doc_top_tokens, DOC_TOP_TOKENS_SQL),
    "emb_norms": (emb_norms, EMB_NORMS_SQL),
    "emb_knn_bruteforce": (emb_knn_bruteforce, EMB_KNN_BRUTEFORCE_SQL),
    "emb_label_centroid_dist": (
        emb_label_centroid_dist,
        EMB_LABEL_CENTROID_DIST_SQL,
    ),
}
