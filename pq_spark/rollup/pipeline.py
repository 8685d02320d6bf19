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
from .pages import (
    _PAGE_TABLE_ARGS,
    _page_enriched,
    extract_text_udf,
    page_samples,  # noqa: F401 — public seam, used by tests/benchmarks
    page_series_dim_from_enriched,
)
from .tiers import TIER_MS, attach_series, tier_from_tier, tier_partials


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
    salt_buckets: int = 0,
    gorilla_block_ms: int = 3_600_000,
    check_extraction: bool = True,
    pack: bool = True,
    cache_pages: bool = False,
) -> dict:
    """Execute the full cascade with lineage; returns metrics (incl.
    rolled-up points/sec, the BASELINE headline metric).

    cache_pages: persist the page table across the (extraction-check, fact,
    dim) scans — right when the source is a generator or slow storage and
    fits the cache; at 100 TB leave False and let the columnar source be
    scanned per pass (column pruning reads only what each pass needs).
    """
    from ..engine.runner import configure_session

    configure_session(spark)  # ANSI off / UTC / AQE even on a default session
    store = TierStore(out_path)
    metrics: dict = {"stages": {}}
    t_start = time.time()
    if cache_pages:
        pages = pages.persist()

    # star schema: the NARROW fact (sig, ts, seq, value) feeds both the tier
    # cascade and the Gorilla packer — label maps live in the tiny series
    # dim. Only the fact is cached; at cluster scale it'd be a checkpointed
    # table.
    from pyspark.sql import functions as _F

    from ..engine.ingest import samples_from_table
    from ..engine.planner import sig_expr
    from .tiers import series_dim, series_key  # noqa: F401

    # FUSED extraction check: the enriched projection already decodes the
    # heavy `html` column (content_len), so the byte-identity invariant
    # (`_bad`) rides the SAME scan instead of a second full read of the
    # page table. The narrow projection is persisted, the Arrow UDF is paid
    # exactly once, and the post-write `sum(_bad)` below is a cache hit.
    enriched = _page_enriched(pages, verify=check_extraction).persist()
    samples_wide = samples_from_table(enriched, **_PAGE_TABLE_ARGS)
    # `_sig` is the statically-concatenated signature samples_from_table
    # precomputes (same string sig_expr derives from the map, minus the
    # per-row map build/sort) — fall back for sample sources without it
    skey_col = (
        series_key(_F.col("_sig"))
        if "_sig" in samples_wide.columns
        else series_key(sig_expr(_F.col("labels")))
    )
    samples = samples_wide.select(
        skey_col.alias("skey"), "ts", "seq", "value"
    ).persist()
    # label-space fast path: one narrow aggregate over page rows instead of
    # a signature-distinct over the 3x-wider sample union (round-5 verdict
    # item 5 — the dim build was ~23% of the tier_1m stage); built from the
    # persisted enriched projection so it reuses the fused-verify cache.
    dim = page_series_dim_from_enriched(enriched).persist()

    # tier cascade with resume: the cascade itself stays NARROW (skey-keyed
    # partials, persisted); labels attach only at each commit edge. Each
    # tier commits date-partitioned with manifests; unchanged partitions are
    # skipped on re-runs.
    t0 = time.time()
    p1m = tier_partials(samples, "1m", salt_buckets=salt_buckets, dim=dim).persist()
    # tier_1m's heavy data write runs BEFORE the invariant check joins, but
    # with publish=False nothing it wrote is visible (manifests + CURRENT
    # swap are staged) — a violation aborts with zero published state, so
    # readers can never serve tiers derived from bad extractions.
    r1 = store.commit(
        with_date(attach_series(p1m, dim)), "tier_1m",
        publish=not check_extraction,
    )

    if check_extraction:
        t0v = time.time()
        mismatches = enriched.agg(_F.sum("_bad")).first()[0] or 0
        if mismatches:
            raise RuntimeError(
                f"extraction invariant violated for {mismatches} pages"
            )
        store.finalize_commit(r1)
        metrics["stages"]["verify_extraction"] = {
            "elapsed_s": round(time.time() - t0v, 3), "fused": True
        }
    metrics["stages"]["tier_1m"] = r1.metrics

    p1h = tier_from_tier(p1m, "1h").persist()
    r2 = store.commit(with_date(attach_series(p1h, dim)), "tier_1h")
    metrics["stages"]["tier_1h"] = r2.metrics

    p1d = tier_from_tier(p1h, "1d")
    r3 = store.commit(with_date(attach_series(p1d, dim)), "tier_1d")
    metrics["stages"]["tier_1d"] = r3.metrics
    metrics["stages"]["cascade_elapsed_s"] = time.time() - t0
    p1m.unpersist()
    p1h.unpersist()

    if pack:
        t0 = time.time()
        packed = gorilla.pack_blocks(samples, block_ms=gorilla_block_ms, dim=dim)
        rp = store.commit(
            with_date(packed, ts_col="block_ts"), "gorilla_blocks"
        )
        metrics["stages"]["gorilla"] = rp.metrics

    samples.unpersist()
    dim.unpersist()
    enriched.unpersist()
    if cache_pages:
        pages.unpersist()
    total_points = (
        metrics["stages"]["tier_1m"]["rows_total"]
        + metrics["stages"]["tier_1h"]["rows_total"]
        + metrics["stages"]["tier_1d"]["rows_total"]
    )
    # the TIMED region ends here — everything below is reporting, not
    # pipeline work (the compression-evidence scan must not deflate
    # points_per_sec, the cross-round headline metric)
    elapsed = time.time() - t_start
    metrics["rolled_up_points"] = total_points
    metrics["elapsed_s"] = elapsed
    metrics["points_per_sec"] = total_points / elapsed if elapsed > 0 else 0.0

    if pack:
        # compression evidence from the committed table (one tiny agg):
        # raw = 16 B/point (ts + value), packed = Σ blob bytes
        comp = store.read(spark, "gorilla_blocks").agg(
            F.sum("raw_bytes").alias("raw"),
            F.sum(F.length("blob")).alias("packed"),
            F.sum("n").alias("points"),
        ).collect()[0]
        metrics["gorilla_raw_bytes"] = int(comp["raw"] or 0)
        metrics["gorilla_packed_bytes"] = int(comp["packed"] or 0)
        metrics["gorilla_points"] = int(comp["points"] or 0)
        metrics["gorilla_compression"] = round(
            comp["raw"] / comp["packed"], 2
        ) if comp["packed"] else None
    return metrics


def main() -> None:
    """spark-submit entry point::

        spark-submit --py-files dist/pq_spark.zip pq_spark/rollup/pipeline.py \
            --pages <parquet path>  --out /data/tiers [--synth-pages N]
    """
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path to a page table (parquet)")
    ap.add_argument("--warc", help="glob of .warc/.warc.gz files to ingest")
    ap.add_argument("--synth-pages", type=int, help="generate N synthetic pages instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--block-ms", type=int, default=6 * 3_600_000)
    ap.add_argument("--no-pack", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pq_spark-rollup").getOrCreate()
    for k, v in {
        "spark.sql.ansi.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    if args.synth_pages:
        from .pages import synth_pages

        pages = synth_pages(spark, args.synth_pages)
    elif args.warc:
        from .pages import pages_from_warc

        pages = pages_from_warc(spark, args.warc)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        raise SystemExit("one of --pages / --warc / --synth-pages is required")

    metrics = run_pipeline(
        spark, pages, args.out,
        salt_buckets=args.salt_buckets,
        gorilla_block_ms=args.block_ms,
        pack=not args.no_pack,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
