"""ElasticSearchReader analog (reference entry point #2, SURVEY §3.2):

fixture events → filter algebra → flatten → enrichment join → hourly
index table.  Run: ``python examples/index_pipeline.py [out_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from garmadon_spark import filters as gf
from garmadon_spark.operators.enrich import enrich_with_app_metadata
from garmadon_spark.session import get_spark
from garmadon_spark.sinks.archive import write_hourly_index
from garmadon_spark.sources import fixtures


def main(out_dir: str) -> None:
    spark = get_spark("garmadon-index-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    dfs = fixtures.to_spark(spark, n_apps=6, seed=3)

    # the ES reader's subscription: YARN_APPLICATION-tagged FS events
    fs = dfs["fs_event"].filter(
        gf.and_all(gf.has_tag("YARN_APPLICATION"), gf.any_filter())
    )
    enriched = enrich_with_app_metadata(fs, dfs["application_event"])

    write_hourly_index(enriched.drop("id"), f"{out_dir}/index",
                       ts_col="timestamp", event_type="FS_EVENT")
    idx = spark.read.parquet(f"{out_dir}/index")
    print("indexed rows:", idx.count())
    idx.groupBy("hour").agg(F.count(F.lit(1)).alias("docs")).orderBy(
        "hour"
    ).show(5, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp("garmadon_idx"))
