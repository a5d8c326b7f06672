"""Streaming corpus operators: ingest-time quality monitoring.

A 100 TB/day scrape pipeline cannot discover a quality regression (a
broken extractor, a language-mix shift, a boilerplate flood) from a
batch job that runs tomorrow — the gates and their telemetry belong at
the ingest boundary.  Everything in the batch text-analysis tier that
is a scalar expression (quality ratios, language ID, PII counts,
token stats) runs UNCHANGED on a stream; this module adds the windowed
aggregation shell around it.

Plan shape: scan → scalar quality/langid expressions (stateless, fused
into the stream's map stage) → watermarked tumbling window keyed on
(window, lang).  State = one row per (window, language) — independent
of document volume; the 26 h default watermark matches the archive's
late-data grace (W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from garmadon_spark.operators import dedup, text


def clean_corpus_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "26 hours",
    min_quality: float = 0.15,
    text_col: str = "text",
) -> DataFrame:
    """The streaming front door of the corpus tier: exact-dedup
    re-scraped documents on their normalized content hash, then gate on
    the composite quality score — so duplicates and junk never reach
    the archive, instead of being cleaned up by tomorrow's batch job.

    Dedup state is one row per content hash within the watermark
    (``dropDuplicatesWithinWatermark`` — bounded by distinct docs per
    26 h, not stream history; the unbounded ``dropDuplicates`` trap at
    100 TB/day).  The quality gate is a stateless scalar filter fused
    into the same stage.  On a batch DataFrame (backfill over the
    archive) the same function keeps one row per hash via a
    min-(ts, id)-free ``dropDuplicates`` — callers comparing the two
    paths should compare surviving hash SETS, which are identical, not
    which copy survived (streaming keeps the first ARRIVAL)."""
    hashed = docs.withColumn(
        "content_hash", dedup.content_hash(text_col)
    )
    if hashed.isStreaming:
        deduped = hashed.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    else:
        deduped = hashed.dropDuplicates(["content_hash"])
    scored = text.quality_score(deduped, text_col=text_col)
    return scored.filter(F.col("quality_score") >= min_quality)


def monitor_quality(
    docs: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "26 hours",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-(window, language) corpus-quality telemetry over a document
    stream: volume, mean composite quality, mean repetition ratio, mean
    length, and the low-quality fraction (score < 0.15 — the
    doc_corpus_filter gate), so a drop shows up in the same trigger
    that ingested it.  Works identically on a batch DataFrame (no
    watermark applied) for backfills over the archive."""
    scored = text.quality_score(docs, text_col=text_col)
    if scored.isStreaming:
        scored = scored.withWatermark(ts_col, watermark)
    low = F.when(F.col("quality_score") < 0.15, 1.0).otherwise(0.0)
    return (
        scored.groupBy(F.window(ts_col, window).alias("w"), lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.round(F.avg("repetition_ratio"), 4).alias("avg_repetition"),
            F.round(F.avg(F.length(text_col)), 4).alias("avg_chars"),
            F.round(F.avg(low), 4).alias("low_quality_frac"),
        )
        .select(
            F.col("w.start").alias("bucket"), lang_col, "n_docs",
            "avg_quality", "avg_repetition", "avg_chars",
            "low_quality_frac",
        )
    )
