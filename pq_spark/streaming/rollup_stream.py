"""Structured Streaming variant of the rollup engine.

pq is a streaming engine over stdin; on bounded input our batch planner is
observationally equivalent (SURVEY §2.8). For genuinely unbounded input,
this module provides the streaming skins:

- ``streaming_tier``: the 1m/1h/1d continuous aggregate as a watermarked
  windowed aggregation. pq's buffer eviction (reference:
  src/query/vector.rs:125-126,178-202 — drop samples older than
  ``next_instant − lookback``) maps exactly onto the watermark: late data
  beyond the lookback is dropped on arrival (vector.rs:100-102).
- ``streaming_last_value``: the staleness-aware lookback gap-fill (pq's
  instant-vector selector) as a custom stateful operator via
  ``applyInPandasWithState`` — per series, keeps the last sample and emits
  one row per closed bucket while the sample is fresh (within lookback),
  dropping the series when it goes stale. This is the operator Spark's
  built-in window aggs can't express (it must emit rows for buckets with
  NO input).

Both consume a stream of sample rows (ts: long ms, name, labels flattened
to a ``sig`` string, value) — e.g. from a Kafka/file source of extraction
events.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def streaming_tier(
    sample_stream: DataFrame, tier: str = "1m", watermark: str = "5 minutes"
) -> DataFrame:
    """Watermarked windowed partial aggregates (same schema as the batch
    tier tables, so the batch cascade re-aggregates streaming output)."""
    secs = TIER_SECONDS[tier]
    with_event_time = sample_stream.withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    ).withWatermark("event_time", watermark)
    win = F.window("event_time", f"{secs} seconds")
    return (
        with_event_time.groupBy(win.alias("w"), F.col("sig"), F.col("name"))
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.min("ts").alias("first_ts"),
            F.min_by("value", F.struct("ts", "seq")).alias("first_val"),
            F.max("ts").alias("last_ts"),
            F.max_by("value", F.struct("ts", "seq")).alias("last_val"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ts"),
            "sig", "name", "cnt", "sum", "min", "max",
            "first_ts", "first_val", "last_ts", "last_val",
        )
    )


_LAST_VALUE_STATE_SCHEMA = "last_ts long, last_val double, emitted_until long"
_LAST_VALUE_OUT_SCHEMA = "sig string, bucket_ts long, value double, filled boolean"


def _last_value_fn(interval_ms: int, lookback_ms: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (sig,) = key
        if state.exists:
            last_ts, last_val, emitted_until = state.get
        else:
            last_ts, last_val, emitted_until = None, None, None

        max_ts = last_ts
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "seq"])
            t = int(pdf["ts"].iloc[-1])
            if max_ts is None or t >= max_ts:
                max_ts = t
                last_val = float(pdf["value"].iloc[-1])
        if max_ts is None:
            return

        # emit one row per closed bucket covered by freshness:
        # buckets b with b_end in (emitted_until, max_ts + lookback]
        first_bucket = (
            (max_ts // interval_ms) * interval_ms
            if emitted_until is None
            else emitted_until
        )
        out_rows = []
        b = first_bucket
        while b <= max_ts + lookback_ms - interval_ms:
            src_fresh = b < max_ts + lookback_ms
            if src_fresh and b >= (max_ts // interval_ms) * interval_ms:
                out_rows.append((sig, b, last_val, b != (max_ts // interval_ms) * interval_ms))
            b += interval_ms

        state.update((max_ts, last_val, b))
        state.setTimeoutDuration(lookback_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["sig", "bucket_ts", "value", "filled"])

    return fn


def streaming_last_value(
    sample_stream: DataFrame, interval_ms: int = 60_000, lookback_ms: int = 300_000
) -> DataFrame:
    """Custom stateful gap-fill: per series, carry the last value across
    empty buckets while within the lookback (pq instant-selector semantics,
    reference: src/query/vector.rs:205-223), evicting stale series via
    state timeout (the analogue of pq's purge_before)."""
    return sample_stream.groupBy("sig").applyInPandasWithState(
        _last_value_fn(interval_ms, lookback_ms),
        outputStructType=_LAST_VALUE_OUT_SCHEMA,
        stateStructType=_LAST_VALUE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
