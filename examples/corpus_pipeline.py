"""Pretraining-corpus preparation pipeline, end to end — the corpus-prep
tier composed the way a dataset build actually runs:

  documents → PII scrub → boilerplate line removal → bigram-LM
  perplexity gate (CCNet-style: drop the most-surprising tail) →
  quality/length/dedup gates (doc_corpus_filter semantics) → accepted
  set → sequence packing bookkeeping → per-language quality telemetry
  (the batch form of streaming/corpus.monitor_quality, for backfills).

Run: ``python examples/corpus_pipeline.py [sf_dir] [out_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from garmadon_spark.operators import corpus, dedup, text
from garmadon_spark.session import get_spark, load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="garmadon_corpus_")
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    # 1. PII scrub (scalar regexp chain — zero shuffle)
    scrubbed = corpus.scrub_pii(docs)
    n_pii = scrubbed.filter(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    ).count()

    # 2. boilerplate line removal (line-df on hashes + broadcast anti-join)
    cleaned = corpus.remove_frequent_lines(
        scrubbed.select("doc_id", "text"), min_df=20
    ).select("doc_id", "text")
    base = scrubbed.drop("text").join(cleaned, "doc_id")

    # 3. bigram-LM perplexity gate (CCNet-style): score every doc under
    # the corpus-trained model, drop the most-surprising 5 % — a
    # relative cutoff, so it transfers across corpora without tuning
    ppl = text.perplexity_scores(base.select("doc_id", "text"))
    cut = ppl.agg(
        F.expr("percentile(cross_entropy, 0.95)")
    ).head()[0]
    base = base.join(
        ppl.filter(F.col("cross_entropy") <= cut).select("doc_id"), "doc_id"
    )
    n_ppl = base.count()

    # 4. gates: length + quality + exact-dedup survivorship, one pass
    scored = text.quality_score(base)
    w = Window.partitionBy(dedup.content_hash("text"))
    flagged = scored.withColumn(
        "keep", F.col("doc_id") == F.min("doc_id").over(w)
    )
    accepted = flagged.filter(
        (F.length("text") >= 100)
        & (F.col("quality_score") >= 0.15)
        & F.col("keep")
    )
    accepted.select("doc_id", "text", "lang", "source").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/accepted")
    n_ok = spark.read.parquet(f"{out_dir}/accepted").count()

    # 5. sequence-packing bookkeeping over the accepted set
    assigned = corpus.pack_sequences(
        spark.read.parquet(f"{out_dir}/accepted"), seq_len=256, n_shards=8
    )
    packs = corpus.pack_summary(assigned, seq_len=256)
    n_packs = packs.count()
    fill = packs.agg(
        F.round(F.avg(F.col("pack_tokens") / 256.0), 4)
    ).head()[0]

    # 6. per-language quality telemetry (archive-backfill form of the
    # streaming monitor)
    tele = (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy(F.desc("n_docs"))
    )
    top = [(r.lang, r.n_docs, r.avg_quality) for r in tele.head(3)]

    print(
        f"docs={n_in} pii_docs={n_pii} ppl_kept={n_ppl} accepted={n_ok} "
        f"rejected={n_in - n_ok} packs={n_packs} avg_fill={fill} "
        f"top_langs={top} out={out_dir}"
    )


if __name__ == "__main__":
    main()
