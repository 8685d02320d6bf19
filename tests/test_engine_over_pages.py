"""Integration: the pq query engine over the north-rule page corpus —
PromQL-style queries against extraction-event samples derived from
(url, warc_ts, html, text, lang) pages, plus cross-checks against the
tier rollup on the same data."""

import pytest
from pyspark.sql import functions as F

from pq_spark.engine.runner import PqEngine
from pq_spark.rollup.pages import page_samples, synth_pages
from pq_spark.rollup.tiers import rollup_tier


@pytest.fixture(scope="module")
def page_ctx(spark):
    pages = synth_pages(spark, 3000).cache()
    samples = page_samples(pages).cache()
    return pages, samples


def test_sum_by_lang_matches_tier(spark, page_ctx):
    """engine `sum by (lang)(text_len)` at interval=1m, since-anchored, with
    lookback=1m must agree with the 1m tier per-bucket sums wherever every
    series in a bucket has ≥1 sample (engine carries staleness, tier does
    not — compare only on buckets where both are fresh)."""
    pages, samples = page_ctx
    start = samples.agg(F.min("ts")).collect()[0][0]
    since = start - (start % 60000)

    eng = PqEngine(spark, strict=False)
    vf = eng.evaluate(
        'sum by (lang) (text_len)', samples, since_ms=since, interval_ms=60_000
    )
    got = {
        (r["instant"] - 59_999, r["labels"]["lang"]): r["value"]
        for r in vf.cells.collect()
    }

    tier = rollup_tier(samples.filter(F.col("name") == "text_len"), "1m")
    per_bucket_lang = (
        tier.groupBy("bucket_ts", F.col("labels").getItem("lang").alias("lang"))
        .agg(F.sum("last_val").alias("sum_last"))
        .collect()
    )
    # engine instant at bucket+59999 sums the LATEST text_len per series in
    # (bucket-1ms, bucket+59999]; the tier's last_val per series is exactly
    # that latest sample → per-(bucket, lang) sums of last_val must match
    checked = 0
    for r in per_bucket_lang:
        key = (r["bucket_ts"], r["lang"])
        if key in got:
            assert abs(got[key] - r["sum_last"]) < 1e-6, key
            checked += 1
    assert checked > 50


def test_matcher_on_domain(spark, page_ctx):
    pages, samples = page_ctx
    eng = PqEngine(spark, strict=False)
    vf = eng.evaluate('text_len{domain="domain00.example"}', samples,
                      interval_ms=3_600_000)
    rows = vf.cells.select("labels").limit(20).collect()
    assert rows
    assert all(r["labels"]["domain"] == "domain00.example" for r in rows)

    # regex matcher across hot domains
    vf2 = eng.evaluate('__line__{domain=~"domain0[01].example"}', samples,
                       interval_ms=3_600_000)
    doms = {r["labels"]["domain"] for r in vf2.cells.select("labels").collect()}
    assert doms <= {"domain00.example", "domain01.example"}


def test_query_served_from_tier_equals_raw(spark):
    """Rollup-serving equivalence: an instant-vector aggregate served FROM
    the 1m tier (samples_from_tier) is IDENTICAL to the same query over raw
    samples at interval == tier with an aligned --since — the per-bucket
    last IS the latest sample in each grid window. This is the cascade's
    reason to exist: the tier-served scan is #series × #buckets rows."""
    import pq_spark.driver_queries as dq

    sf = "/root/testdata/sf0.001"
    raw = dq.QUERIES["pq_sum_by_et"](spark, sf)
    tier = dq.QUERIES["pq_sum_by_et_over_tier_1m"](spark, sf)
    a = sorted(tuple(r) for r in raw.collect())
    b = sorted(tuple(r) for r in tier.collect())
    assert a == b and len(a) > 0
