"""Training-data dedup pipeline, end to end (the extension surface a
100 TB corpus pipeline actually runs):

  documents → tiered near-dup detection
    tier 1  exact (normalized content hash)
    tier 2  blocked n-gram Jaccard (shingle df-cap)
    tier 3  MinHash → LSH buckets → exact-Jaccard verify
  → union of pair evidence → connected components → keep/drop decision
  → deduplicated corpus written out
  → DAY 2: the incremental path — hash index + signature index persisted
    from day 1, today's increment deduped against them without re-reading
    the accepted corpus.

Run: ``python examples/dedup_pipeline.py [sf_dir] [out_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from garmadon_spark.operators import dedup
from garmadon_spark.session import get_spark, load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="garmadon_dedup_")
    spark = get_spark("dedup-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # tier 2: exact Jaccard inside (lang, source) blocks with the
    # stop-shingle df-cap (subsumes tier-1 exact dups at jaccard=1.0)
    jac = dedup.jaccard_pairs(
        docs, ("lang", "source"), n=2, threshold=0.5
    ).select("doc_a", "doc_b")

    # tier 3: corpus-wide MinHash-LSH with exact verification
    mh = dedup.minhash_dedup(
        docs, n=2, num_hashes=64, bands=16, threshold=0.5
    ).select("doc_a", "doc_b")

    # evidence union → transitive closure → canonical survivor per group
    pairs = jac.unionByName(mh).distinct()
    comp = dedup.components(pairs)
    decisions = comp.select(
        "doc_id",
        F.col("component").alias("dup_group"),
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )

    kept = (
        docs.join(
            decisions.filter(~F.col("keep")).select("doc_id"),
            "doc_id", "left_anti",
        )
    )
    kept.write.mode("overwrite").parquet(f"{out_dir}/documents_dedup")
    decisions.write.mode("overwrite").parquet(f"{out_dir}/dup_decisions")

    n_kept = spark.read.parquet(f"{out_dir}/documents_dedup").count()
    n_groups = decisions.filter(F.col("keep")).count()
    print(
        f"docs={n_docs} kept={n_kept} dropped={n_docs - n_kept} "
        f"dup_groups_touched={n_groups} out={out_dir}"
    )

    # ---- day 2: incremental update against the persisted indexes ----
    # The accepted corpus is represented ONLY by its hash index and its
    # MinHash signature index — the daily job never re-reads day 1.
    accepted = spark.read.parquet(f"{out_dir}/documents_dedup")
    accepted.select(
        dedup.content_hash("text").alias("content_hash")
    ).distinct().write.mode("overwrite").parquet(f"{out_dir}/hash_index")
    dedup.minhash_signatures(accepted, n=2, num_hashes=64).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/sig_index")

    # today's increment: re-scraped copies of some accepted docs plus
    # genuinely new ones (stand-in: perturbed copies of the corpus tail)
    increment = docs.orderBy(F.desc("doc_id")).limit(max(n_docs // 10, 5))
    increment = increment.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))  # exact re-scrape
        .otherwise(F.concat(F.col("text"), F.lit(" updated")))
        .alias("text"),
    )
    hash_index = spark.read.parquet(f"{out_dir}/hash_index")
    new_exact = dedup.incremental_exact_dedup(increment, hash_index)
    sig_index = spark.read.parquet(f"{out_dir}/sig_index")
    near = dedup.incremental_minhash(
        increment, sig_index, n=2, num_hashes=64, bands=32, threshold=0.5
    )
    print(
        f"increment={increment.count()} "
        f"new_after_exact={new_exact.count()} "
        f"near_dup_pairs_vs_corpus={near.count()}"
    )


if __name__ == "__main__":
    main()
