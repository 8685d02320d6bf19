#!/usr/bin/env python
"""Generate the committed media fixture (fixtures/media.parquet).

One-shot: the multimodal driver row (media_header_facts) needs a media
table BOTH engines can read — Spark computes header facts JVM-side, the
DuckDB oracle restates them from the same bytes. synth_media's generator
hashes with xxhash64 (Spark-only), so the table is materialized ONCE here
and committed; the driver row then tests the multimodal TABLE PATH
(binary column + typed metadata through real parquet) under the oracle.

Usage: python scripts/make_media_fixture.py  (rewrites fixtures/media.parquet)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import shutil
import tempfile

from pyspark.sql import SparkSession

from pq_spark.multimodal import synth_media

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "media.parquet")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # Spark's own writer keeps `meta` a real STRUCT in the parquet schema
    # (a pandas round-trip flattens it); coalesce(1) + move → single file
    tmp = tempfile.mkdtemp()
    (synth_media(spark, 240, seed=7).orderBy("media_id").coalesce(1)
     .write.mode("overwrite").option("compression", "zstd").parquet(tmp))
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, OUT)
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"wrote {OUT}: {os.path.getsize(OUT)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
