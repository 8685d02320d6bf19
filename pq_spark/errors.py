"""Error types for the pq_spark engine.

Mirrors the error surface of the reference (iximiuz/pq): parse errors abort
the program; per-record errors are skipped silently (reference:
src/runner.rs:141-168); matching violations abort the query (reference:
src/query/value.rs:86-92,114-116 panics).
"""


class PqError(Exception):
    """Base error for pq_spark."""


class ParseError(PqError):
    """Program / query-expression parse error."""

    def __init__(self, message: str, pos: int | None = None):
        super().__init__(message if pos is None else f"{message} (at offset {pos})")
        self.message = message
        self.pos = pos


class MatchingError(PqError):
    """Vector-matching violation (duplicate series / many-to-one without
    group modifier) — the reference panics here."""
