"""Pretraining-corpus preparation pipeline, end to end — the corpus-prep
tier composed the way a dataset build actually runs:

  documents → PII scrub → boilerplate line removal → cross-doc
  repeated-n-gram scrub (bounded exact-substring dedup) → bigram-LM
  perplexity gate (CCNet-style: drop the most-surprising tail) →
  model-based quality gate (hashed-linear classifier) →
  Gopher structural-rule gate (+ full rule-set telemetry) →
  quality/length/dedup gates (doc_corpus_filter semantics) → accepted
  set → DSIR importance weights toward the target language → training-
  mix plan + deterministic stratified sample → sequence packing
  bookkeeping → deterministic epoch-shuffle shards + manifest →
  per-language quality telemetry (the batch form of
  streaming/corpus.monitor_quality, for backfills).

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

    # 2b. cross-doc repeated-n-gram scrub (bounded exact-substring
    # dedup): verbatim spans shared by ≥3 docs are licence blocks /
    # templates at this corpus size — remove them everywhere before
    # any scoring sees them
    scrub = dedup.scrub_repeated_ngrams(
        base.select("doc_id", "text"), k=8, min_docs=3
    )
    n_span_docs = scrub.filter(F.col("n_flagged_spans") > 0).count()
    base = base.drop("text").join(
        scrub.select("doc_id", F.col("clean_text").alias("text")),
        "doc_id",
    ).filter(F.length("text") > 0)

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

    # 3b. model-based quality gate: the hashed-linear classifier scores
    # every doc as one scalar expression; a low absolute floor drops
    # only the tail (stand-in weights — swap for trained parameters)
    clf = text.hashed_linear_score(base.select("doc_id", "text"))
    base = base.join(
        clf.filter(F.col("quality_prob") >= 0.30).select("doc_id"),
        "doc_id",
    )

    # 3c. Gopher hard rules: gate on the STRUCTURAL subset (symbol /
    # bullet / ellipsis / alpha-word rules — format junk), report the
    # full rule set.  The lexical rules (stopword floor, word-count
    # band) are calibrated for natural prose; on this synthetic corpus
    # they would reject everything, which is telemetry, not a gate.
    gop = text.gopher_rules(base.select("doc_id", "text"))
    n_gopher_full = gop.filter(F.col("accepted")).count()
    structural_ok = gop.filter(
        F.col("pass_symbol_ratio") & F.col("pass_bullet_lines")
        & F.col("pass_ellipsis_lines") & F.col("pass_alpha_words")
    )
    base = base.join(structural_ok.select("doc_id"), "doc_id")

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

    # 4b. training mix: plan per-language rates for a 60 % token budget
    # against what actually survived the gates, then apply them with
    # the deterministic hash sampler (reproducible across reruns)
    acc = spark.read.parquet(f"{out_dir}/accepted")
    targets = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    plan = corpus.mixture_plan(acc, targets, budget_fraction=0.6)
    rates = {r.lang: r.sample_rate for r in plan.collect()}
    # buckets=10_000: mixture rates can sit well below 1 %, and the
    # sampler's resolution is 1/buckets
    mixed = text.stratified_hash_sample(
        acc, "doc_id", rates, stratum_col="lang", buckets=10_000
    )
    mixed.write.mode("overwrite").parquet(f"{out_dir}/mixed")
    n_mixed = spark.read.parquet(f"{out_dir}/mixed").count()

    # 4c. DSIR importance weights: how target-like (English here) each
    # accepted doc looks — the principled alternative to the stratified
    # mix when curating toward a reference distribution; the weights
    # feed text.weighted_sample for a Gumbel-top-k selection
    dsir = corpus.dsir_weights(
        acc.select("doc_id", "text"),
        acc.filter(F.col("lang") == "en").select("doc_id", "text"),
        buckets=1024,
    )
    dsir_stats = dsir.agg(
        F.round(F.avg("log_weight"), 3).alias("avg"),
        F.round(F.max("log_weight"), 3).alias("max"),
    ).head()

    # 5. sequence-packing bookkeeping over the mixed set
    assigned = corpus.pack_sequences(
        spark.read.parquet(f"{out_dir}/mixed"), seq_len=256, n_shards=8
    )
    packs = corpus.pack_summary(assigned, seq_len=256)
    n_packs = packs.count()
    fill = packs.agg(
        F.round(F.avg(F.col("pack_tokens") / 256.0), 4)
    ).head()[0]

    # 5b. materialize the epoch: deterministic shuffle shards (same
    # seed ⇒ same order — resumable loaders) + the loader's manifest
    corpus.write_training_shards(
        spark.read.parquet(f"{out_dir}/mixed"),
        f"{out_dir}/shards", n_shards=4, seed=0,
    )
    man = corpus.shard_manifest(
        spark.read.parquet(f"{out_dir}/mixed"), n_shards=4, seed=0
    )
    n_shards_written = man.count()

    # 5c. retrieval prep: sliding-window chunking of the accepted set
    # (what an embedding job consumes) — map-only, zero shuffle
    chunks = corpus.chunk_documents(
        acc.select("doc_id", "text"), chunk_chars=500, overlap=100
    )
    n_chunks = chunks.count()

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

    # 6b. the publishable datasheet: one scan over the shipped corpus
    report = corpus.corpus_report(spark.read.parquet(f"{out_dir}/mixed"))
    n_cohorts = report.count()

    print(
        f"docs={n_in} pii_docs={n_pii} span_docs={n_span_docs} "
        f"ppl_kept={n_ppl} gopher_full={n_gopher_full} "
        f"accepted={n_ok} rejected={n_in - n_ok} "
        f"mixed={n_mixed} packs={n_packs} avg_fill={fill} "
        f"dsir_avg={dsir_stats['avg']} dsir_max={dsir_stats['max']} "
        f"shards={n_shards_written} chunks={n_chunks} "
        f"report_cohorts={n_cohorts} top_langs={top} out={out_dir}"
    )


if __name__ == "__main__":
    main()
