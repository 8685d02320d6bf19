"""The north-rule rollup pipeline: pages → events → 1m/1h/1d tiers →
Gorilla blocks, with per-partition lineage + checkpoint resume.

Run it as a spark-submit job::

    spark-submit --py-files pq_spark.zip -m pq_spark.rollup.pipeline \
        --pages <parquet-or-iceberg-path> --out /data/tiers

or programmatically via ``run_pipeline``. Every stage is a pure DataFrame
transformation; the only Python on the data path is the Arrow-batched
extraction UDF and the Gorilla pack kernel.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import gorilla
from .lineage import TierStore, with_date
from .pages import extract_text_udf, page_samples
from .tiers import TIER_MS, rollup_tier, tier_from_tier


def verify_extraction(pages: DataFrame) -> int:
    """Byte-identical per-url extraction invariant: count mismatches
    (must be 0). Distributed check — no collect of page data."""
    extracted = pages.withColumn("_etext", extract_text_udf()(F.col("html")))
    return extracted.filter(
        ~F.col("_etext").eqNullSafe(F.col("text"))
    ).count()


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    salt_buckets: int = 8,
    gorilla_block_ms: int = 3_600_000,
    check_extraction: bool = True,
    pack: bool = True,
) -> dict:
    """Execute the full cascade with lineage; returns metrics (incl.
    rolled-up points/sec, the BASELINE headline metric)."""
    store = TierStore(out_path)
    metrics: dict = {"stages": {}}
    t_start = time.time()

    if check_extraction:
        t0 = time.time()
        mismatches = verify_extraction(pages)
        if mismatches:
            raise RuntimeError(
                f"extraction invariant violated for {mismatches} pages"
            )
        metrics["stages"]["verify_extraction"] = {"elapsed_s": time.time() - t0}

    # the samples fact table feeds both the tier cascade and the Gorilla
    # packer — materialize it once (at cluster scale: a checkpointed table)
    samples = page_samples(pages).persist()

    # tier cascade with resume: each tier commits date-partitioned with
    # manifests; unchanged partitions are skipped on re-runs.
    t0 = time.time()
    tier_1m = rollup_tier(samples, "1m", salt_buckets=salt_buckets)
    r1 = store.commit(with_date(tier_1m), "tier_1m")
    metrics["stages"]["tier_1m"] = r1.metrics

    lower = store.read(spark, "tier_1m").drop("date")
    tier_1h = tier_from_tier(lower, "1h")
    r2 = store.commit(with_date(tier_1h), "tier_1h")
    metrics["stages"]["tier_1h"] = r2.metrics

    lower_h = store.read(spark, "tier_1h").drop("date")
    tier_1d = tier_from_tier(lower_h, "1d")
    r3 = store.commit(with_date(tier_1d), "tier_1d")
    metrics["stages"]["tier_1d"] = r3.metrics
    metrics["stages"]["cascade_elapsed_s"] = time.time() - t0

    if pack:
        t0 = time.time()
        packed = gorilla.pack_blocks(samples, block_ms=gorilla_block_ms)
        rp = store.commit(
            with_date(packed, ts_col="block_ts"), "gorilla_blocks"
        )
        metrics["stages"]["gorilla"] = rp.metrics

    samples.unpersist()
    total_points = (
        metrics["stages"]["tier_1m"]["rows_total"]
        + metrics["stages"]["tier_1h"]["rows_total"]
        + metrics["stages"]["tier_1d"]["rows_total"]
    )
    elapsed = time.time() - t_start
    metrics["rolled_up_points"] = total_points
    metrics["elapsed_s"] = elapsed
    metrics["points_per_sec"] = total_points / elapsed if elapsed > 0 else 0.0
    return metrics
