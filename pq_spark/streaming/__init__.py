from .rollup_stream import streaming_tier, streaming_last_value

__all__ = ["streaming_tier", "streaming_last_value"]
