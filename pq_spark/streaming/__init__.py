from .rollup_stream import (
    streaming_hll_tier,
    streaming_last_value,
    streaming_tier,
)

__all__ = ["streaming_tier", "streaming_last_value", "streaming_hll_tier"]
