"""CLI option semantics not covered by the reference's golden corpus:
--since / --until / --lookback / --interval interplay (reference:
src/cliopt.rs, src/parse/mapping/mapper.rs:45-54, src/query/vector.rs:29-45).
Expected outputs hand-derived from the reference semantics."""

import json

from pq_spark import run_cli

PROGRAM = (
    r"/([^\s]+)\s(\w+)\s(\d+)/ "
    r'| map {.0:ts "%Y-%m-%dT%H:%M:%S", .1 as name, .2 as age} '
    r"| select sum(age) | to_promapi"
)

LOG = [
    "2021-01-01T00:00:00 bob 10",
    "2021-01-01T00:00:02 bob 20",
    "2021-01-01T00:00:04 bob 30",
    "2021-01-01T00:00:06 bob 40",
]
T0 = 1609459200000  # 2021-01-01T00:00:00Z


def _lines(out: bytes):
    return [json.loads(l) for l in out.decode().splitlines()]


def test_since_anchors_grid(spark):
    # --since 00:00:01 → t0 = since + 1s − 1ms = 00:00:01.999; the :00
    # record is dropped by the range filter, the :02 sample is outside the
    # first instant's (00.999, 01.999] window → leading empty vector
    out = _lines(run_cli(spark, ["pq", PROGRAM, "--since", "2021-01-01 00:00:01"], LOG))
    assert out[0]["result"] == []
    assert out[1]["result"][0]["value"] == [1609459202.999, "20"]


def test_until_stops_stream(spark):
    out = _lines(run_cli(spark, ["pq", PROGRAM, "--until", "2021-01-01 00:00:03"], LOG))
    values = [r["result"][0]["value"][1] for r in out if r["result"]]
    assert values == ["10", "20"]  # :04 and :06 never enter the stream


def test_lookback_extends_staleness(spark):
    # an instant vector holds the LATEST sample per series within lookback
    # (staleness window), so a longer lookback only makes values persist:
    # with 3s lookback the :06 sample is still fresh at :07.999 and :08.999,
    # and no instant is empty (at 1s lookback every odd second is empty)
    out = _lines(run_cli(spark, ["pq", PROGRAM, "--lookback", "3s"], LOG))
    got = {round(r["result"][0]["value"][0], 3): r["result"][0]["value"][1]
           for r in out if r["result"]}
    assert len(got) == len(out) == 9  # :00.999 .. :08.999, none empty
    assert got[1609459201.999] == "10"   # :00 sample persists
    assert got[1609459204.999] == "30"   # latest within (:01.999, :04.999]
    assert got[1609459208.999] == "40"   # trailing drain, still fresh


def test_interval_widens_grid(spark):
    out = _lines(run_cli(spark, ["pq", PROGRAM, "--interval", "4s"], LOG))
    # lookback defaults to the interval → t0 = min(4s,4s) − 1ms = :03.999;
    # each instant carries the LATEST sample in its 4s staleness window
    assert [round(r["result"][0]["value"][0], 3) for r in out] == [
        1609459203.999, 1609459207.999]
    assert [r["result"][0]["value"][1] for r in out] == ["20", "40"]
