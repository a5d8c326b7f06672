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

from garmadon_spark.operators import text


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
