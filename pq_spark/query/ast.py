"""Query-expression AST.

Same shape as the reference AST (reference: src/query/parser/ast.rs) so the
planner can mirror the reference evaluator's dispatch exactly, but it is our
own IR — the planner lowers it to a PySpark DataFrame DAG, not an iterator
tree.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from ..errors import ParseError

NAME_LABEL = "__name__"
LINE_METRIC = "__line__"

ARITHMETIC = {"+", "-", "*", "/", "%", "^"}
COMPARISON = {"==", "!=", ">", ">=", "<", "<="}
LOGICAL = {"and", "unless", "or"}

# reference: src/query/parser/ast.rs:238-251
PRECEDENCE = {
    "or": 10,
    "and": 20,
    "unless": 20,
    "==": 30,
    ">=": 30,
    ">": 30,
    "<": 30,
    "<=": 30,
    "!=": 30,
    "+": 40,
    "-": 40,
    "*": 50,
    "/": 50,
    "%": 50,
    "^": 60,
}


def op_kind(op: str) -> str:
    if op in ARITHMETIC:
        return "arithmetic"
    if op in COMPARISON:
        return "comparison"
    return "logical"


class Expr:
    """Base class for expression nodes."""


@dataclass
class NumberLiteral(Expr):
    value: float


@dataclass
class Parentheses(Expr):
    inner: Expr


@dataclass
class UnaryOperation(Expr):
    op: str  # '+' | '-'
    inner: Expr


@dataclass
class LabelMatcher:
    """Label matcher with reference semantics.

    - regex matchers are auto-anchored ``^(?:v)$``
      (reference: src/model/labels.rs:79-84)
    - a sample lacking the label never matches, even for ``!=`` / ``!~``
      (reference: src/query/vector.rs:56-64)
    """

    label: str
    op: str  # '=' | '!=' | '=~' | '!~'
    value: str
    _re: _re.Pattern | None = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        if self.op in ("=~", "!~"):
            try:
                object.__setattr__(self, "_re", _re.compile(f"^(?:{self.value})$"))
            except _re.error as e:
                raise ParseError(f"bad label matcher regex: {e}")

    @property
    def is_name_matcher(self) -> bool:
        return self.label == NAME_LABEL

    def matches(self, v: str) -> bool:
        if self.op == "=":
            return self.value == v
        if self.op == "!=":
            return self.value != v
        assert self._re is not None
        if self.op == "=~":
            return self._re.match(v) is not None
        return self._re.match(v) is None

    @property
    def anchored_pattern(self) -> str:
        """The anchored regex pattern (for Spark ``rlike``)."""
        return f"^(?:{self.value})$"


@dataclass
class VectorSelector(Expr):
    matchers: list[LabelMatcher]
    duration_ms: int | None = None  # range selector when set
    offset_ms: int = 0  # extension: the reference's expr.rs:33 TODO
    at_ms: int | None = None  # extension: PromQL `@ <ts>` modifier

    @staticmethod
    def create(
        name: str | None,
        matchers: list[LabelMatcher],
        duration_ms: int | None,
        offset_ms: int = 0,
        at_ms: int | None = None,
    ) -> "VectorSelector":
        # reference: src/query/parser/ast.rs:387-416
        matches_everything = all(m.matches("") for m in matchers)
        has_name_matcher = any(m.is_name_matcher for m in matchers)
        if name is not None and has_name_matcher:
            raise ParseError("potentially ambiguous metric name match")
        if name is None and matches_everything:
            raise ParseError("vector selector must contain at least one non-empty matcher")
        matchers = list(matchers)
        if name is not None:
            matchers.append(LabelMatcher(NAME_LABEL, "=", name))
        return VectorSelector(matchers, duration_ms, offset_ms, at_ms)


@dataclass
class Subquery(Expr):
    """Extension (PromQL subquery, absent from the reference grammar —
    src/query/parser/expr.rs has no ``[range:step]`` production): evaluate
    ``inner`` as an instant vector on its own ``step``-interval grid, then
    expose those per-instant samples as a range vector of width ``range``
    to the enclosing function, e.g. ``max_over_time(rate(v[1m])[10m:1m])``.
    ``step_ms=None`` means "default to the outer evaluation interval"
    (PromQL's resolution default)."""

    inner: Expr
    range_ms: int
    step_ms: int | None = None
    offset_ms: int = 0
    at_ms: int | None = None  # extension: PromQL `@ <ts>` modifier


@dataclass
class AggregateOperation(Expr):
    op: str  # sum|min|max|avg|count|group|topk|bottomk|quantile|stddev|stdvar|count_values
    inner: Expr
    modifier: tuple[str, frozenset[str]] | None = None  # ('by'|'without', labels)
    argument: float | str | None = None


@dataclass
class BinaryOperation(Expr):
    op: str
    lhs: Expr
    rhs: Expr
    bool_modifier: bool = False
    label_matching: tuple[str, frozenset[str]] | None = None  # ('on'|'ignoring', labels)
    group_modifier: tuple[str, list[str]] | None = None  # ('left'|'right', labels)

    def __post_init__(self):
        # reference: src/query/parser/ast.rs:130-150 asserts
        if self.bool_modifier and op_kind(self.op) != "comparison":
            raise ParseError("bool modifier can only be used with a comparison operator")
        if self.group_modifier is not None and self.label_matching is None:
            raise ParseError("group modifier requires on/ignoring")
        if self.group_modifier is not None and op_kind(self.op) == "logical":
            raise ParseError("group modifier cannot be used with a logical operator")


@dataclass
class FunctionCall(Expr):
    name: str
    args: list  # Expr | float | str


AGG_OVER_TIME_FUNCS = {
    "avg_over_time",
    "count_over_time",
    "last_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
}

# Extension over-time functions (PromQL-style rate family) — NOT in the
# reference engine; gated behind PqEngine(extensions=True).
EXTENSION_OVER_TIME_FUNCS = {"rate", "irate", "increase", "delta", "idelta"}


def find_smallest_range_ms(node: Expr) -> int | None:
    """Smallest range-literal in the query (reference:
    src/query/evaluator.rs:154-182) — the default grid interval."""
    if isinstance(node, Parentheses):
        return find_smallest_range_ms(node.inner)
    if isinstance(node, AggregateOperation):
        return find_smallest_range_ms(node.inner)
    if isinstance(node, UnaryOperation):
        return find_smallest_range_ms(node.inner)
    if isinstance(node, BinaryOperation):
        l = find_smallest_range_ms(node.lhs)
        r = find_smallest_range_ms(node.rhs)
        if l is None:
            return r
        if r is None:
            return l
        return min(l, r)
    if isinstance(node, FunctionCall):
        for a in node.args:
            if isinstance(a, Expr):
                got = find_smallest_range_ms(a)
                if got is not None:
                    return got
        return None
    if isinstance(node, VectorSelector):
        return node.duration_ms
    if isinstance(node, Subquery):
        # the subquery's own range is a range literal too; the inner
        # expression may carry smaller selector ranges (rate windows)
        got = find_smallest_range_ms(node.inner)
        if got is not None:
            return min(got, node.range_ms)
        return node.range_ms
    return None
