"""Decoder-only / mapper-only program outputs (json + human formatters)."""

from pq_spark import PqEngine

LOG = [
    "2021-01-01T00:00:01 bob 42",
    "2021-01-01T00:00:02 sarah 25",
    "garbage line !!!",
]

PAT = r"/([^\s]+)\s(\w+)\s(\d+)/"
MAP = '| map {.0:ts "%Y-%m-%dT%H:%M:%S", .1 as name, .2 as age}'


def test_decoder_only_json(spark):
    res = PqEngine(spark).run_program(PAT + " | to_json", LOG)
    assert res.output_lines() == [
        '["2021-01-01T00:00:01","bob","42"]',
        '["2021-01-01T00:00:02","sarah","25"]',
    ]


def test_decoder_only_human(spark):
    res = PqEngine(spark).run_program(PAT, LOG)
    assert res.output_lines() == [
        "2021-01-01T00:00:01\tbob\t42",
        "2021-01-01T00:00:02\tsarah\t25",
    ]


def test_mapper_only_json(spark):
    res = PqEngine(spark).run_program(PAT + " " + MAP + " | to_json", LOG)
    assert res.output_lines() == [
        '{"timestamp":1609459201000,"labels":{"name":"bob"},"values":{"age":42.0}}',
        '{"timestamp":1609459202000,"labels":{"name":"sarah"},"values":{"age":25.0}}',
    ]


def test_mapper_only_human(spark):
    res = PqEngine(spark).run_program(PAT + " " + MAP, LOG)
    assert res.output_lines() == [
        "2021-01-01T00:00:01.000\tname=bob\tage=42",
        "2021-01-01T00:00:02.000\tname=sarah\tage=25",
    ]


def test_query_human(spark):
    res = PqEngine(spark).run_program(PAT + " " + MAP + " | select sum(age)", LOG)
    lines = res.output_lines()
    # empty vectors produce no output lines in non-verbose human mode
    # aggregation drops all labels (and __name__) → just "ts\tvalue";
    # note the human ts floors to the second and always prints .000
    # (reference timestamp.rs:33-36). With the default 1s lookback, bob's
    # :01 sample is stale at the :02.999 instant → second line sums sarah only.
    assert lines[0] == "2021-01-01T00:00:01.000\t42"
    assert lines[-1] == "2021-01-01T00:00:02.000\t25"


def test_json_decoder_program(spark):
    res = PqEngine(spark).run_program("json | to_json", [
        '{"user":"bob","latency":0.25,"ok":true,"nested":{"x":1}}',
        '[1, "a", null]',
        "not json",
    ])
    assert res.output_lines() == [
        '{"latency":"0.25","ok":"true","user":"bob"}',
        '["1","a","null"]',
    ]


def test_json_program_full_query(spark):
    """JSON decoder → named map → select — full engine over Dict entries."""
    lines = [
        '{"time":"2021-01-01 00:00:02","user":"bob","latency":0.25}',
        '{"time":"2021-01-01 00:00:02","user":"sarah","latency":0.5}',
        '{"time":"2021-01-01 00:00:03","user":"bob","latency":1.25}',
        '{"user":"nobody"}',
    ]
    program = (
        'json | map {.time:ts "%Y-%m-%d %H:%M:%S", .user as user, '
        ".latency:num as latency} | select sum(latency) by (user) | to_promapi"
    )
    from pq_spark import PqEngine

    res = PqEngine(spark).run_program(program, lines)
    out = res.output_lines()
    assert out[0] == (
        '{"resultType":"vector","result":['
        '{"metric":{"user":"bob"},"value":[1609459202.999,"0.25"]},'
        '{"metric":{"user":"sarah"},"value":[1609459202.999,"0.5"]}]}'
    )
    assert out[1] == (
        '{"resultType":"vector","result":['
        '{"metric":{"user":"bob"},"value":[1609459203.999,"1.25"]}]}'
    )
