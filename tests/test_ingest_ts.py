"""JVM half of the timestamp guess cascade (ingest._guess_ts_jvm) must
agree with the Python cascade (timeparse.try_parse_time) wherever it
claims a value — NULL rows fall back to Python, so only a non-NULL
disagreement can corrupt results."""

import pyspark.sql.functions as F
import pytest

from pq_spark.engine.ingest import _guess_ts_jvm, _ts_expr
from pq_spark.timeparse import try_parse_time

# the reference time-guessing table (src/utils/time.rs) + edge shapes:
# deeper fractions, case-variant months, exotic zones, weekday mismatch,
# bare RFC2822, unix digit widths, invalid dates, non-times
CASES = [
    "2021-01-01 00:00:00",
    "2021-01-01 00:00:00.00",
    "2021-01-01 00:00:00.00000",
    "2021-01-01T00:00:00.00000",
    "2021-01-01 01:00:00.00000 +0100",
    "2020-12-31 14:30:00.00000 -0930",
    "2021-01-01T00:00:00+00:00",
    "Fri, 1 Jan 2021 00:00:00 +0000",
    "01/Jan/2021:00:00:00 -0000",
    "1609459200",
    "1609459200100",
    "2023-01-02T03:04:05Z",
    "2023-01-02T03:04:05z",
    "2023-01-02T03:04:05.5Z",
    "2023-01-02T03:04:05.123+02:00",
    "2023-01-02T03:04:05.1234Z",
    "Tue, 1 Jul 2003 10:52:37 +0200",
    "Tue, 01 Jul 2003 10:52:37 GMT",
    "1 Jul 2003 10:52:37 +0000",
    "Tue, 1 Jul 2003 10:52:37 EST",
    "Wed, 1 Jul 2003 10:52:37 +0200",  # wrong weekday: parsedate ignores it
    "01/Jul/2003:10:52:37 +0200",
    "01/jul/2003:10:52:37 +0200",  # case-variant month: None on both paths
    "2024-03-05 06:07:08",
    "2024-03-05T06:07:08",
    "2024-03-05 06:07:08.25",
    "2024-03-05 06:07:08 +0130",
    "2024-03-05 06:07:08.5 -0200",
    "2024-02-29 10:00:00",
    "170000000",
    "17000000001234",
    "not a time",
    "",
    "9999-12-31 23:59:59",
    "2024-12-31T23:59:59.999Z",
]


def _python_cascade(s):
    try:
        return try_parse_time(s)
    except Exception:
        return "RAISE"


def test_jvm_cascade_agrees_with_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    got = {
        r["s"]: r["j"]
        for r in df.select("s", _guess_ts_jvm(F.col("s")).alias("j")).collect()
    }
    for c in CASES:
        py = _python_cascade(c)
        j = got[c]
        if j is not None:
            assert py == j, f"JVM claimed {c!r} with {j}, python says {py}"


def test_jvm_cascade_claims_common_shapes(spark):
    # the bulk log formats must be answered WITHOUT the Python fallback
    # RFC2822 is deliberately NOT here: its JVM expression blew the
    # whole-stage codegen method past the JIT threshold (see
    # _guess_ts_jvm) — parsedate rows ride the masked Python fallback
    claimed = [
        "2023-01-02T03:04:05Z",
        "2023-01-02T03:04:05.123+02:00",
        "01/Jul/2021:00:00:00 -0000",
        "2021-01-01 00:00:00",
        "2021-01-01T00:00:00",
        "1609459200",
        "1609459200100",
    ]
    df = spark.createDataFrame([(c,) for c in claimed], "s string")
    rows = df.select("s", _guess_ts_jvm(F.col("s")).alias("j")).collect()
    for r in rows:
        assert r["j"] == try_parse_time(r["s"]), r["s"]


def test_full_ts_expr_matches_python_cascade(spark):
    # the composed expression (JVM shapes + masked pandas fallback) must
    # equal the pure-Python cascade row for row, including fallback rows
    ok = [c for c in CASES if _python_cascade(c) != "RAISE"]
    df = spark.createDataFrame([(c,) for c in ok], "s string")
    got = {
        r["s"]: r["t"]
        for r in df.select("s", _ts_expr(F.col("s"), None).alias("t")).collect()
    }
    for c in ok:
        assert got[c] == _python_cascade(c), c
