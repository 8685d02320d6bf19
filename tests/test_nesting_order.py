"""Iteration-order parity for NESTED aggregations.

The reference's count/group aggregators seed their accumulator with the
FIRST sample of the input vector in the input's own emission order
(/root/reference/src/query/aggregate.rs:44-66: `agg.insert(sig, cur_value)`
on first sight, `agg_value + 1.0` afterwards — so count == first + n − 1).
That emission order is:

- selector:      BTreeMap order of the series signature (vector.rs)
- topk output:   BTreeMap order of the GROUP signature (aggregate.rs:190+,
                 `agg.values().flat_map(...)`)
- binary output: the LHS vector's emission order (value.rs:95-127,
                 `for (labels, lvalue) in self.samples.iter()`)

The engine tracks exactly this in the dim's `ord` column and ranks the
count/group/topk tie-break windows by it.  These fixtures are built so the
input-emission order DIFFERS from the output-signature order — they fail
if the ranking regresses to `sig`.
"""

import pytest

from pq_spark.engine.frames import VectorFrame
from pq_spark.engine.runner import PqEngine

SCHEMA = "seq long, ts long, name string, labels map<string,string>, value double"


def _cells(result):
    rows = result.cells.orderBy("instant", "ord").collect()
    return [(r["instant"], dict(r["labels"]), r["value"]) for r in rows]


def _run(spark, q, rows, **kw):
    sdf = spark.createDataFrame(rows, SCHEMA)
    engine = PqEngine(spark, strict=False, extensions=True)
    result = engine.evaluate(q, sdf, interval_ms=1000, lookback_ms=1000)
    assert isinstance(result, VectorFrame)
    return _cells(result)


def test_count_over_topk_seeds_in_group_order(spark):
    # topk by (u) (1, m): group u=1 emits first (BTreeMap on group sig),
    # its winner is m{h=z,u=1}=5.0 — but by ORIGINAL series sig the other
    # winner m{h=a,u=2}=7.0 sorts first (h=a < h=z).  The reference seeds
    # count with 5.0 (group-emission order) => 5 + (2-1) = 6.
    rows = [
        (1, 1000, "m", {"__name__": "m", "h": "z", "u": "1"}, 5.0),
        (2, 1000, "m", {"__name__": "m", "h": "a", "u": "2"}, 7.0),
    ]
    out = _run(spark, "count(topk by (u) (1, m))", rows)
    # single instant t0 = 1000 + min(lb, iv) - 1 = 1999; one {} group
    assert out == [(1999, {}, 6.0)]


def test_count_over_binary_seeds_in_lhs_order(spark):
    # a + on(u) b emits in LHS order: a{h=a,u=2} sorts first among the lhs
    # series, so the binary output emits (20+2)=22 before (10+1)=11 even
    # though the OUTPUT sigs ({u:1} < {u:2}) order the other way round.
    # count seeds with 22 => 22 + (2-1) = 23.
    rows = [
        (1, 1000, "a", {"__name__": "a", "h": "z", "u": "1"}, 10.0),
        (2, 1000, "a", {"__name__": "a", "h": "a", "u": "2"}, 20.0),
        (3, 1000, "b", {"__name__": "b", "u": "1"}, 1.0),
        (4, 1000, "b", {"__name__": "b", "u": "2"}, 2.0),
    ]
    out = _run(spark, "count(a + on(u) b)", rows)
    assert out == [(1999, {}, 23.0)]


def test_count_over_name_dropped_over_time_follows_input_order(spark):
    # sum_over_time drops __name__ but the emission order keeps the
    # original (name-included) series order: m{h=z} emits before n{h=a}
    # (BTreeMap: "...m..." < "...n..."), while the name-dropped output sigs
    # order h=a < h=z.  count seeds with m's sum (5) => 5 + (2-1) = 6.
    rows = [
        (1, 1000, "m", {"__name__": "m", "h": "z"}, 5.0),
        (2, 1000, "n", {"__name__": "n", "h": "a"}, 7.0),
    ]
    out = _run(spark, 'count(sum_over_time({__name__=~"m|n"}[1s]))', rows)
    assert out == [(1999, {}, 6.0)]


def test_group_seeding_follows_emission_order(spark):
    # same fixture as the topk case but with group(): single-sample groups
    # keep the seeded value, multi-sample groups collapse to 1.0 — the
    # seeded value is the first-emitted series of the nested input.
    rows = [
        (1, 1000, "m", {"__name__": "m", "h": "z", "u": "1"}, 5.0),
        (2, 1000, "m", {"__name__": "m", "h": "a", "u": "2"}, 7.0),
    ]
    out = _run(spark, "group(topk by (u) (1, m))", rows)
    # two samples in the {} group => quirk collapses to 1.0 regardless;
    # and per-group (by u) single samples keep their value
    assert out == [(1999, {}, 1.0)]
    out2 = _run(spark, "group by (u) (topk by (u) (1, m))", rows)
    assert out2 == [
        (1999, {"u": "1"}, 5.0),
        (1999, {"u": "2"}, 7.0),
    ]
