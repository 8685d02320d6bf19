from .pages import extract_text_udf, page_samples, synth_pages
from .warc import read_warc, write_warc
from .tiers import (
    TIER_MS,
    gapfill,
    over_time_from_tier,
    rollup_cascade,
    rollup_tier,
    samples_from_tier,
    series_dim,
    tier_from_tier,
    tier_partials,
)

__all__ = [
    "synth_pages",
    "extract_text_udf",
    "page_samples",
    "TIER_MS",
    "rollup_tier",
    "tier_from_tier",
    "rollup_cascade",
    "gapfill",
    "over_time_from_tier",
    "samples_from_tier",
    "series_dim",
    "tier_partials",
    "read_warc",
    "write_warc",
]
