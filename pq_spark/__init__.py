"""pq_spark — a PySpark-native time-series analytics engine with the query
semantics of iximiuz/pq, recast as a rollup + downsample + retention pipeline.

Built from scratch on the DataFrame API: the reference's single-threaded
pull-iterator pipeline becomes a declarative Spark plan (scan → decode/map →
sample unpivot → per-selector grid + gap-fill → expression combinators),
optimized by Catalyst and executed by Tungsten.
"""

from .engine import PqEngine, run_cli
from .errors import MatchingError, ParseError, PqError
from .program import parse_program
from .query.parser import parse_expr

__version__ = "0.1.0"

__all__ = [
    "PqEngine",
    "run_cli",
    "parse_program",
    "parse_expr",
    "PqError",
    "ParseError",
    "MatchingError",
]
