from .pages import extract_text_udf, page_samples, synth_pages
from .tiers import TIER_MS, gapfill, rollup_cascade, rollup_tier, tier_from_tier

__all__ = [
    "synth_pages",
    "extract_text_udf",
    "page_samples",
    "TIER_MS",
    "rollup_tier",
    "tier_from_tier",
    "rollup_cascade",
    "gapfill",
]
