#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation, build-vs-execute split, Spark job counts, and plan
capture. ``bench.py`` is frozen for driver measurement; everything
exploratory lives here.

Usage::

    python bench_extra.py --queries pq_instant_vector tier_1m   # subset
    python bench_extra.py --plans plans/r08 --suffix before     # capture explains
    python bench_extra.py                                        # all headline queries
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time

HEADLINE = [
    "pq_instant_vector",
    "pq_sum_by_et",
    "pq_count_over_time",
    "pq_rate_1h",
    "tier_1m",
    "tier_1d_cascade",
    "gapfill_1m_day1",
    "dedup_minhash_sig",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "contam_overlap",
    "sample_stratified",
    "text_repetition",
    "pq_stress_topk_rate",
    "ts_asof_join",
    "tier_routed_window",
    "text_dup_spans",
    "ts_sessionize",
    "url_canonical_dedup",
    "winnow_pairs",
]


def _mk_spark(cpus: int):
    import bench

    return bench._mk_spark(cpus)


def _job_count(spark) -> int:
    t = spark.sparkContext.statusTracker()
    return len(t.getJobIdsForGroup(None) or [])


def profile_queries(spark, sf_dir: str, names: list[str], reps: int,
                    plans_dir: str | None, suffix: str) -> dict:
    from pq_spark.driver_queries import QUERIES

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    # warm-up (codegen/JIT) — same protocol as bench.py
    for name in names:
        QUERIES[name](spark, sf_dir).count()
    for name in names:
        sc.setJobDescription(f"bench_extra: {name}")
        samples = []
        build_s = []
        jobs_build = jobs_exec = 0
        plan_txt = ""
        for r in range(reps):
            j0 = len(sc.statusTracker().getActiveJobsIds() or [])
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            if r == 0:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan_txt = buf.getvalue()
            t1b = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build_s.append(round(t1 - t0, 3))
            samples.append(round(t2 - t1b, 3))
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan_txt)
        out[name] = {
            "noop_s": samples,
            "noop_min": min(samples),
            "build_s": build_s,
        }
        sc.setJobDescription(None)
    return out


def ts_bench(spark, n: int = 2_000_000) -> dict:
    """Decoder microbench: format-guess timestamp parsing over n synthetic
    log-format lines — old pure-pandas cascade vs the staged JVM cascade
    with masked Python fallback (the shipped no-format decode path)."""
    import pyspark.sql.functions as F

    from pq_spark.engine.ingest import _guess_ts_jvm, _guess_ts_udf

    base = spark.range(n).select(
        F.when(F.col("id") % 4 == 0,
               F.concat(F.lit("2024-03-0"), (F.col("id") % 9 + 1).cast("string"),
                        F.lit("T10:11:12Z")))
        .when(F.col("id") % 4 == 1,
              F.concat(F.lit("01/Jul/2021:00:00:"),
                       F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                       F.lit(" +0200")))
        .when(F.col("id") % 4 == 2,
              (F.lit(1600000000) + F.col("id") % 10000).cast("string"))
        .otherwise(F.concat(F.lit("2021-01-01 00:00:"),
                            F.lpad((F.col("id") % 60).cast("string"), 2, "0"),
                            F.lit(".25")))
        .alias("s")
    ).persist()
    base.count()

    def t(df, reps=3):
        df.write.format("noop").mode("overwrite").save()
        out = []
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out.append(round(time.time() - t0, 3))
        return min(out)

    old = t(base.select(_guess_ts_udf()(F.col("s")).alias("t")))
    st = base.withColumn("_j", _guess_ts_jvm(F.col("s")))
    new = t(st.withColumn(
        "t", F.coalesce(F.col("_j"), _guess_ts_udf()(F.when(F.col("_j").isNull(), F.col("s"))))
    ).select("t"))
    jvm_only = t(base.select(_guess_ts_jvm(F.col("s")).alias("t")))
    diffs = st.select(
        _guess_ts_udf()(F.col("s")).alias("a"),
        F.coalesce(F.col("_j"), _guess_ts_udf()(F.when(F.col("_j").isNull(), F.col("s")))).alias("b"),
    ).filter("a IS DISTINCT FROM b").count()
    base.unpersist()
    return {"n": n, "old_udf_s": old, "new_staged_s": new,
            "jvm_only_s": jvm_only, "diff_rows": diffs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write explain('formatted') to")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--ts-bench", action="store_true",
                    help="run the decoder guess-cascade microbench instead")
    args = ap.parse_args()

    spark = _mk_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.ts_bench:
            print(json.dumps(ts_bench(spark)))
            return
        names = args.queries or HEADLINE
        res = profile_queries(spark, args.sf_dir, names, args.reps, args.plans, args.suffix)
        print(json.dumps(res, indent=1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
