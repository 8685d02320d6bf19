"""Parser unit tests — ported from the reference's inline test tables
(reference: src/program.rs:430-480, src/query/parser/expr.rs:555-798,
src/utils/parse/duration.rs:134-189, src/utils/time.rs:90-119)."""

import math

import pytest

from pq_spark.errors import ParseError
from pq_spark.floatfmt import json_f64_str, rust_f64_str
from pq_spark.program import JsonDecoder, RegexDecoder, parse_program
from pq_spark.query.ast import (
    BinaryOperation,
    NumberLiteral,
    Parentheses,
    UnaryOperation,
    VectorSelector,
)
from pq_spark.query.parser import parse_expr
from pq_spark.timeparse import parse_duration, try_parse_time

SECOND = 1000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR
WEEK = 7 * DAY
YEAR = 365 * DAY


# ---------------------------------------------------------------- durations
@pytest.mark.parametrize("s,ms", [
    ("1ms", 1),
    ("10s", 10000),
    ("0s500ms", 500),
    ("5s999ms", 5999),
    ("1y2w3d4h5m6s7ms", YEAR + 2 * WEEK + 3 * DAY + 4 * HOUR + 5 * MINUTE + 6 * SECOND + 7),
])
def test_valid_duration(s, ms):
    assert parse_duration(s) == ms


@pytest.mark.parametrize("s", ["foo", "0", "0ms", "1ns", "0s0ms", "10m2h"])
def test_invalid_duration(s):
    with pytest.raises(ParseError):
        parse_duration(s)


# ------------------------------------------------------------- time guessing
@pytest.mark.parametrize("s,ms", [
    ("2021-01-01 00:00:00", 1609459200000),
    ("2021-01-01 00:00:00.00", 1609459200000),
    ("2021-01-01 00:00:00.00000", 1609459200000),
    ("2021-01-01T00:00:00.00000", 1609459200000),
    ("2021-01-01 01:00:00.00000 +0100", 1609459200000),
    ("2020-12-31 14:30:00.00000 -0930", 1609459200000),
    ("2021-01-01T00:00:00+00:00", 1609459200000),
    ("Fri, 1 Jan 2021 00:00:00 +0000", 1609459200000),
    ("01/Jan/2021:00:00:00 -0000", 1609459200000),
    ("1609459200", 1609459200000),
    ("1609459200100", 1609459200100),
])
def test_try_parse_time(s, ms):
    assert try_parse_time(s) == ms


# ------------------------------------------------------------------ programs
@pytest.mark.parametrize("program", [
    r"//",
    r"/foo/",
    r"/foo\/bar/",
    r"/.*(\\d+)foo\\s(\\w+).+/",
    r"json",
    r"json | to_json",
    r"json| to_json",
    r"json |to_json",
    r"json|to_json",
    r"json | to_promapi",
    r"/.*(\\d+)foo\\s(\\w+).+/ | to_json",
    r'/.*(\\d+)foo\\s(\\w+).+/ | map {foo: "bar"} | to_json',
    r'/.*(\\d+)foo\\s(\\w+).+/ | map {.0:str, .1:num as qux, .2:ts "%Y-%m-%d", foo: "bar"} | to_json',
    r'/.*(\\d+)foo\\s(\\w+).+/ | map {.foo:str as bar, .qux:num, .ts:ts "%Y-%m-%d", abc: "42"} | to_json',
    r'/.*(\\d+)foo\\s(\\w+).+/ | map {.foo:str as bar, .qux:num, .ts:ts "%Y-%m-%d", abc: "42"} | select {__name__=~"abc|foo"} / 9001 | to_json',
])
def test_valid_program(program):
    parse_program(program)


@pytest.mark.parametrize("program,expected", [
    (r"//", ""),
    (r"/foo/", "foo"),
    (r"/foo\/bar/", "foo/bar"),
])
def test_regex_decoder(program, expected):
    ast = parse_program(program)
    assert isinstance(ast.decoder, RegexDecoder)
    assert ast.decoder.regex == expected


def test_json_decoder():
    assert isinstance(parse_program("json").decoder, JsonDecoder)


def test_program_validations():
    with pytest.raises(ParseError):  # two timestamps
        parse_program(r'json | map {.a:ts, .b:ts}')
    with pytest.raises(ParseError):  # ambiguous end name
        parse_program(r'json | map {.a, .b as a}')
    with pytest.raises(ParseError):  # mixed positional + named
        parse_program(r'/x/ | map {.0, .foo}')


# --------------------------------------------------------------- expressions
@pytest.mark.parametrize("expr", [
    "foo{}",
    "-foo{}",
    "- foo{}",
    "+foo{}",
    "+  foo{}",
    "foo and bar",
    "foo unless bar",
    "foo or bar",
    "sum(foo)",
    "sum(foo) by(job)",
    "bar{} + sum(foo) by(job)",
    "avg(foo) without(job,instanse)",
    "sum by(job) (foo)",
    "avg without(job,instanse) (foo)",
    "124 % avg without(job,instanse) (foo)",
    "quantile(0.95, foo)",
    "topk(3, foo)",
    "bottomk(1.0, foo)",
    "(foo)",
    "(1 + 2) * 3",
    'vector(3) + count_over_time(clamp(foo{qux!~"42"}, -100, 100500))',
])
def test_valid_expressions(expr):
    parse_expr(expr)


def test_expression_shapes():
    e = parse_expr("-1 + 2")
    assert isinstance(e, BinaryOperation) and e.op == "+"
    assert e.lhs == NumberLiteral(-1.0) and e.rhs == NumberLiteral(2.0)

    e = parse_expr("-1---2")
    assert isinstance(e, BinaryOperation) and e.op == "-"
    assert e.lhs == NumberLiteral(-1.0)
    assert isinstance(e.rhs, UnaryOperation) and e.rhs.op == "-"
    assert e.rhs.inner == NumberLiteral(-2.0)

    e = parse_expr("-1 ^ 2 * 3")
    assert e.op == "*" and isinstance(e.lhs, BinaryOperation) and e.lhs.op == "^"

    e = parse_expr("(foo)")
    assert isinstance(e, Parentheses)


def _extract_ops(e):
    if isinstance(e, BinaryOperation):
        return _extract_ops(e.lhs) + _extract_ops(e.rhs) + [e.op]
    if isinstance(e, UnaryOperation):
        return _extract_ops(e.inner)
    if isinstance(e, Parentheses):
        return _extract_ops(e.inner)
    return []


@pytest.mark.parametrize("expr,ops", [
    ("42 + bar", ["+"]),
    ("42.42 + bar", ["+"]),
    ("42.42 + bar % 9000", ["%", "+"]),
    ("-42.42 + -bar % 9000", ["%", "+"]),
    ("foo + bar", ["+"]),
    ("foo + bar - baz", ["+", "-"]),
    ("foo + bar * baz", ["*", "+"]),
    ("foo * bar + baz", ["*", "+"]),
    ("foo * bar ^ baz", ["^", "*"]),
    ("foo * bar ^ baz - qux / abc", ["^", "*", "/", "-"]),
])
def test_precedence(expr, ops):
    assert _extract_ops(parse_expr(expr)) == ops


@pytest.mark.parametrize("expr", [
    "1 >  bool 1",
    "1 == bool 1",
    "1 < bool 2 - 1 * 2",
    "foo != bool 1",
    "foo != bool bar",
])
def test_bool_modifier(expr):
    parse_expr(expr)


@pytest.mark.parametrize("expr", [
    "foo * on() bar",
    "foo % ignoring() bar",
    "foo + on(abc) bar",
    "foo != on(abc,def) bar",
    "foo > on(abc,def,) bar",
    "foo - on(abc) bar / on(qux, lol) baz",
])
def test_label_matching(expr):
    parse_expr(expr)


@pytest.mark.parametrize("expr", [
    "foo * on(test) group_left bar",
    "foo * on(test,blub) group_left() bar",
    "foo + ignoring(abc) group_right (qux) bar",
    "foo + ignoring(abc) group_right(def,qux,) bar",
])
def test_group_modifier(expr):
    parse_expr(expr)


def test_selector_validations():
    with pytest.raises(ParseError):
        parse_expr('foo{__name__="bar"}')  # ambiguous name match
    with pytest.raises(ParseError):
        parse_expr('{}')  # no non-empty matcher
    with pytest.raises(ParseError):
        parse_expr('{foo!="bar"}')  # != "" matches empty → matches everything
    e = parse_expr('foo[1h5m]')
    assert isinstance(e, VectorSelector) and e.duration_ms == 3900 * 1000
    # a selector whose metric name collides with an aggregate keyword is a
    # hard parse error in the reference — keep that behavior
    with pytest.raises(ParseError):
        parse_expr("summary{}")
    # scalar-scalar comparison without bool → plan-time error, parses fine
    parse_expr("1 > 2")


# ------------------------------------------------------------------ floatfmt
@pytest.mark.parametrize("v,s", [
    (42.0, "42"),
    (0.1, "0.1"),
    (-159.0, "-159"),
    (1.5, "1.5"),
    (67.0, "67"),
    (float("inf"), "inf"),
    (float("-inf"), "-inf"),
    (float("nan"), "NaN"),
    (1e21, "1000000000000000000000"),
    (2.5e-8, "0.000000025"),
    (0.0, "0"),
])
def test_rust_f64_str(v, s):
    assert rust_f64_str(v) == s


@pytest.mark.parametrize("v,s", [
    (1609545598.999, "1609545598.999"),
    (1623037143.0, "1623037143.0"),
    (0.0, "0.0"),
])
def test_json_f64_str(v, s):
    assert json_f64_str(v) == s


def test_nan_not_a_metric():
    # nom `double` greedily eats the 'nan' prefix — metric names starting
    # with nan/inf are unparseable in the reference; replicate.
    with pytest.raises(ParseError):
        parse_expr("nancy{}")
    assert math.isnan(parse_expr("NaN").value)


# ------------------------------------------- selector grammar tables
# (ported from reference src/query/parser/vector.rs:131-397)
from pq_spark.query.parser import Cursor, _vector_selector  # noqa: E402


def _sel(s):
    cur = Cursor(s)
    return _vector_selector(cur)


@pytest.mark.parametrize("s,n_matchers,duration_ms", [
    ("foo", 1, None),
    ("foo[1h5m]", 1, 3900 * 1000),
    ("foo or bar", 1, None),          # selector stops before ' or'
    ("foo{}", 1, None),
    ("foo {}", 1, None),
    ("foo {}[5ms]", 1, 5),
    ("foo {}  [1m3s]", 1, 63 * 1000),
    ("foo  {   }", 1, None),
    ('{__name__="foo"}', 1, None),
    ('{__name__=~"foo"}', 1, None),
    ('{__name__=~"foo",__name__=~"bar"}', 2, None),
    ('foo{name=~"bar"}', 2, None),
])
def test_selector_table_valid(s, n_matchers, duration_ms):
    sel = _sel(s)
    assert len(sel.matchers) == n_matchers
    assert sel.duration_ms == duration_ms


@pytest.mark.parametrize("s", [
    "{}",
    '{foo=""}',
    '{foo=~".*"}',
    '{foo!~".+"}',
    '{foo!="bar"}',
    'foo{__name__="foo"}',
    'foo{__name__="bar"}',
])
def test_selector_table_invalid(s):
    with pytest.raises(ParseError):
        _sel(s)


@pytest.mark.parametrize("s", [
    "{",
    "{123",
    "{,}",
    '{foo!~"123 qux",,}',
    "{foo",
    '{foo="bar",f12=}',
    '{foo="bar",baz=~"42",qux!}',
    '{foo=~"*"}',  # bad regex
])
def test_matchers_partial_and_invalid(s):
    with pytest.raises(ParseError):
        _sel(s)


@pytest.mark.parametrize("s,labels", [
    ('{foo!~"123 qux"}', [("foo", "!~", "123 qux")]),
    ('{foo="bar",}', [("foo", "=", "bar")]),
    ('{foo="bar"  ,  }', [("foo", "=", "bar")]),
    ('{    foo   =    "bar",   qux    =   "123"    }',
     [("foo", "=", "bar"), ("qux", "=", "123")]),
])
def test_matchers_table(s, labels):
    # prepend a metric so the all-empty-matcher validation can't reject
    sel = _sel("m" + s)
    got = [(m.label, m.op, m.value) for m in sel.matchers if m.label != "__name__"]
    assert got == labels


def test_offset_modifier_parses():
    """Extension: `offset <duration>` after instant/range selectors (the
    reference's expr.rs:33 TODO)."""
    from pq_spark.query.parser import parse_expr

    e = parse_expr("foo offset 5m")
    assert e.offset_ms == 300_000 and e.duration_ms is None
    e = parse_expr('foo{a="b"}[2m] offset 90s')
    assert e.offset_ms == 90_000 and e.duration_ms == 120_000
    e = parse_expr("sum(foo offset 1h)")
    assert e.inner.offset_ms == 3_600_000
    # 'offset' as a plain metric name still works
    e = parse_expr("a and offset")
    assert e.op == "and"
    # keyword without a duration is an error
    import pytest
    from pq_spark.errors import ParseError

    with pytest.raises(ParseError):
        parse_expr("foo offset")


def test_math_functions_parse():
    """Extension: Prometheus math functions (the reference's evaluator
    panics for every function it lacks)."""
    from pq_spark.query.ast import FunctionCall
    from pq_spark.query.parser import parse_expr

    for name in ("abs", "ceil", "floor", "sqrt", "exp", "ln", "log2",
                 "log10", "sgn", "round"):
        e = parse_expr(f"{name}(foo)")
        assert isinstance(e, FunctionCall) and e.name == name
    # nesting and composition with operators
    e = parse_expr("floor(sqrt(abs(value))) + sgn(value)")
    assert e.op == "+" and e.lhs.name == "floor" and e.rhs.name == "sgn"
    assert e.lhs.args[0].name == "sqrt" and e.lhs.args[0].args[0].name == "abs"
    # a metric literally named like a function (no parens) stays a selector
    e = parse_expr("abs")
    assert not isinstance(e, FunctionCall)
    # statistical over-time: the aggregate-op prefixes (stddev/quantile)
    # must not strand the _over_time suffix (the count_values bug class —
    # _function_call runs before _aggregate)
    e = parse_expr("quantile_over_time(0.5, foo[2m])")
    assert e.name == "quantile_over_time" and e.args[0] == 0.5
    assert e.args[1].duration_ms == 120_000
    for name in ("stddev_over_time", "stdvar_over_time"):
        e = parse_expr(f"{name}(foo[1m])")
        assert e.name == name and e.args[0].duration_ms == 60_000


def test_number_literal_reference_table():
    """Ported from /root/reference/src/utils/parse/number.rs:16-37."""
    import math

    from pq_spark.query.parser import parse_expr

    for s, expected in [("1", 1.0), ("1.", 1.0), (".1", 0.1),
                        ("2e-5", 2e-5), ("Inf", math.inf),
                        ("+Inf", math.inf), ("-Inf", -math.inf)]:
        got = parse_expr(s).value
        if math.isfinite(expected):
            assert abs(got - expected) < 2.220446049250313e-16, s
        else:
            assert got == expected, s


def test_subquery_parses():
    """Extension: PromQL subquery ``expr[range:step]`` (no such production
    in the reference grammar, expr.rs:25-34)."""
    import pytest

    from pq_spark.errors import ParseError
    from pq_spark.query.ast import Subquery, find_smallest_range_ms
    from pq_spark.query.parser import parse_expr

    e = parse_expr("foo[5m:1m]")
    assert isinstance(e, Subquery)
    assert e.range_ms == 300_000 and e.step_ms == 60_000 and e.offset_ms == 0
    assert e.inner.duration_ms is None  # inner is the INSTANT selector

    # empty step defaults to the outer evaluation interval
    e = parse_expr("foo[5m:]")
    assert e.step_ms is None

    # over an arbitrary expression + its own offset
    e = parse_expr("max_over_time((sum by (et) (rate(v[1m])))[10m:30s] offset 2m)")
    sq = e.args[0]
    assert isinstance(sq, Subquery)
    assert sq.range_ms == 600_000 and sq.step_ms == 30_000
    assert sq.offset_ms == 120_000

    # nests
    e = parse_expr("max_over_time(x[2m:30s])[10m:1m]")
    assert isinstance(e, Subquery) and isinstance(e.args if False else e.inner.args[0], Subquery)

    # binds tighter than binary operators
    e = parse_expr("avg_over_time(a[4m:2m]) + 1")
    assert e.op == "+"

    # smallest-range interval inference sees both the subquery range and
    # inner selector ranges
    assert find_smallest_range_ms(parse_expr("foo[5m:1m]")) == 300_000
    assert find_smallest_range_ms(parse_expr("rate(v[1m])[10m:30s]")) == 60_000

    # a plain [dur] postfix on a non-selector is still rejected
    with pytest.raises(ParseError):
        parse_expr("rate(v)[1m]")
    # unterminated subquery
    with pytest.raises(ParseError):
        parse_expr("foo[5m:1m")


def test_at_modifier_parses():
    """Extension: PromQL `@ <unix-ts>` after selectors and subqueries,
    order-free with `offset`, at most once each."""
    import pytest

    from pq_spark.errors import ParseError
    from pq_spark.query.parser import parse_expr

    e = parse_expr("foo @ 1700000000")
    assert e.at_ms == 1_700_000_000_000 and e.offset_ms == 0
    e = parse_expr("foo[5m] @ 1700000000.5")
    assert e.at_ms == 1_700_000_000_500 and e.duration_ms == 300_000
    assert parse_expr("foo @ 1 offset 5m").offset_ms == 300_000
    assert parse_expr("foo offset 5m @ 1").at_ms == 1000
    sq = parse_expr("foo[5m:1m] @ 7 offset 2m")
    assert sq.at_ms == 7000 and sq.offset_ms == 120_000
    assert sq.inner.at_ms is None
    with pytest.raises(ParseError):
        parse_expr("foo @")
    with pytest.raises(ParseError):
        parse_expr("foo @ Inf")
    with pytest.raises(ParseError):
        parse_expr("foo @ 1 @ 2")
