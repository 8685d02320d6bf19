"""Serve pq SELECT queries from STREAMED tier partials (round-4 verdict
item 2: the reference is a streaming engine over stdin — SURVEY §2.8 — and
this closes the architectural property at the query level, not just the
tier level).

Shape: an unbounded sample stream runs through ``streaming_tier`` (the
watermarked windowed aggregate whose watermark ≙ pq's buffer purge,
``rollup_stream.py``), and pq instant-vector / over-time selects are
evaluated BY THE REAL ENGINE over the streamed partials — one row per
(bucket, series) instead of the raw stream, the same serving equivalence
the batch cascade uses (``tiers.samples_from_tier``):

- instant-vector selects (``m``, ``sum by(et) (m)``, …) are EXACT from the
  bucket's ``last_val`` when ``interval == tier width`` and ``--since`` is
  bucket-aligned: the per-bucket last IS the latest sample in each grid
  window, and the ±1 ms grid arithmetic lines up because
  ``floor(ts/B) == floor(bucket(ts)/B)`` for aligned grids — batch output
  over raw data and served output over streamed partials are hash-equal
  (pinned in tests/test_streaming.py on an out-of-order fixture);
- ``sum_over_time(m[k·B])`` is EXACT from the bucket ``sum`` partial (the
  window sum of bucket sums is the raw window sum); ``count_over_time``
  serves the same way from ``cnt`` via a sum rewrite, ``min/max`` from
  ``min``/``max``, and pq's oldest-point ``last_over_time`` from
  ``first_val`` — the per-function partial mapping of
  ``tiers.over_time_from_tier``, here exposed through the engine so the
  full expression grammar (grouping, binary ops, functions) applies.

The stream side must key series by the INVERTIBLE sig2 signature
(``stream_samples_with_sig2``) so the label map can be rebuilt on
dim-sized rows after the streaming shuffle — the same
no-maps-in-aggregation-buffers rule the batch tiers follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_samples_with_sig2(samples: DataFrame) -> DataFrame:
    """Raw sample rows (seq, ts, name, labels, value) → the streaming
    tier's input shape (seq, ts, sig, name, value), with ``sig`` in the
    INVERTIBLE sig2 encoding so query serving downstream can rebuild the
    label map (a plain column projection — safe on a streaming DF)."""
    from ..engine.planner import _sig2_expr

    return samples.select(
        "seq", "ts", _sig2_expr(F.col("labels")).alias("sig"), "name", "value"
    )


def samples_from_streamed_tier(
    streamed_tier: DataFrame, value_col: str = "last_val"
) -> DataFrame:
    """Streamed tier partials (sig2-keyed, label-less) → engine sample rows
    (seq, ts, name, labels, value) carrying the chosen partial as the
    value, one sample per (bucket, series) at the bucket start.

    The label map is rebuilt from the invertible sig2 on DIM-sized rows
    (distinct signatures) and joined back broadcast — label maps never ride
    the aggregation that produced the partials."""
    from ..engine.ingest import NAME_LABEL
    from ..engine.planner import _labels_from_sig2

    # the dim shares the tier's lineage (a self-join): rename its key so
    # the analyzer never sees two conflicting `sig` attributes
    dim = (
        streamed_tier.select(F.col("sig").alias("_dsig"))
        .distinct()
        .select("_dsig", _labels_from_sig2(F.col("_dsig")).alias("labels"))
        .select(
            "_dsig", "labels", F.col("labels").getItem(NAME_LABEL).alias("name")
        )
    )
    return (
        streamed_tier.drop("name")
        .join(F.broadcast(dim), F.col("sig") == F.col("_dsig"))
        .select(
            F.col("bucket_ts").alias("seq"),  # unique per (series, bucket)
            F.col("bucket_ts").alias("ts"),
            "name",
            "labels",
            F.col(value_col).cast("double").alias("value"),
        )
    )


def pq_query_from_streamed_tier(
    spark: SparkSession,
    streamed_tier: DataFrame,
    expr: str,
    since_ms: int,
    tier_ms: int,
    value_col: str = "last_val",
    extensions: bool = True,
):
    """Evaluate a pq expression over streamed tier partials with the real
    engine. Exactness contract (see module docstring): ``since_ms`` must be
    bucket-aligned and the query's interval is pinned to the tier width;
    pick ``value_col`` for the select's semantics — ``last_val`` for
    instant-vector selects, ``sum`` for ``sum_over_time``, ``cnt`` for a
    ``count_over_time``-as-sum rewrite, ``min``/``max``/``first_val`` for
    their over-time functions. Returns the engine's VectorFrame."""
    from ..engine.runner import PqEngine

    samples = samples_from_streamed_tier(streamed_tier, value_col)
    return PqEngine(spark, strict=False, extensions=extensions).evaluate(
        expr,
        samples,
        since_ms=since_ms,
        interval_ms=tier_ms,
        lookback_ms=tier_ms,
    )
