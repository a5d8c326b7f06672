"""HdfsExporter analog (reference entry point #3, SURVEY §3.3):

binary wire frames → streaming decode → per-type split → day-partitioned
gzip parquet archive + table registration.
Run: ``python examples/archive_pipeline.py [out_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql.types import BinaryType, StructField, StructType

from garmadon_spark.schemas import BY_NAME
from garmadon_spark.session import get_spark
from garmadon_spark.sinks.archive import register_table, write_daily_archive
from garmadon_spark.sources import fixtures
from garmadon_spark.sources.frames import (
    decode_frames, decode_typed, encode_frame,
)

HEADER_KEYS = ("application_id", "attempt_id", "container_id", "hostname",
               "username", "framework")


def main(out_dir: str) -> None:
    spark = get_spark("garmadon-archive-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # producer side (agent/forwarder stand-in): fixture rows → frames
    tables = fixtures.generate(n_apps=4, seed=5)
    frames = []
    for tname, rows in tables.items():
        if not rows:
            continue
        marker = BY_NAME[tname.upper()].marker
        for r in rows:
            header = {k: r[k] for k in HEADER_KEYS if k in r}
            body = {k: v for k, v in r.items()
                    if k not in header and k not in
                    ("timestamp", "kafka_partition", "kafka_offset", "tags")}
            frames.append(
                (bytearray(encode_frame(marker, r["timestamp"], header,
                                        body)),)
            )
    schema = StructType([StructField("value", BinaryType())])
    spark.createDataFrame(frames, schema).write.mode("overwrite").parquet(
        f"{out_dir}/frames"
    )

    # consumer side: stream-decode, split per type, archive per day
    stream = spark.readStream.schema(schema).parquet(f"{out_dir}/frames")
    decoded = decode_frames(stream)
    for tname in ("fs_event", "gc_event", "state_event"):
        e = BY_NAME[tname.upper()]
        typed = decode_typed(decoded, e.marker).select(
            "header.*", "body.*", "timestamp"
        )
        q = (
            typed.writeStream.foreachBatch(
                lambda df, _eid, t=tname: write_daily_archive(
                    df, f"{out_dir}/archive/{t}"
                )
            )
            .option("checkpointLocation", f"{out_dir}/ckpt/{tname}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        register_table(spark, tname, f"{out_dir}/archive/{tname}")
        n = spark.read.parquet(f"{out_dir}/archive/{tname}").count()
        print(f"{tname}: archived {n} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp("garmadon_arc"))
