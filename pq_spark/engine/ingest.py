"""Ingest: log lines → entries → records → the samples fact table.

The samples fact table is the engine's core relation — one long, narrow
DataFrame::

    samples(seq: long, ts: long, name: string,
            labels: map<string,string>,   -- INCLUDES __name__
            value: double)

Derivation mirrors the reference pipeline stages (decode → map → sample
fan-out, reference: src/parse/**, src/query/sample.rs:75-113) but is
expressed as native Spark SQL expressions so Catalyst can push filters and
prune columns; the only Python in the hot path is Arrow-batched pandas UDFs
for the JSON decoder and the timestamp guess-cascade (formats the JVM
parser can't express).

Scale notes (100 TB):
- the regex decoder is JVM-side ``regexp_extract`` (codegen'd, no Python);
  one regex evaluation per capture group — for wide patterns prefer the
  table-ingest path (``samples_from_table``) which skips decoding entirely.
- ``lines_from_text`` assigns global line numbers with zipWithIndex (one
  extra pass); the line number only feeds the synthetic ``__line__`` metric,
  so table-based ingest uses a per-partition id instead.
"""

from __future__ import annotations

import re as _pyre

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from ..errors import PqError
from ..program import JsonDecoder, Mapper, RegexDecoder
from ..timeparse import parse_time, strptime_to_java, try_parse_time

NAME_LABEL = "__name__"
LINE_METRIC = "__line__"

def _empty_map(value_type: str):
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast(f"array<{value_type}>")
    )


def lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Small-input helper (golden tests): 1-based line numbers
    (reference: src/input/reader.rs:25-38)."""
    rows = [(i + 1, s) for i, s in enumerate(lines)]
    return spark.createDataFrame(rows, "line_no long, line string")


def lines_from_text(spark: SparkSession, path: str) -> DataFrame:
    """Read a text file with global 1-based line numbers."""
    rdd = spark.read.text(path).rdd.zipWithIndex()
    return rdd.map(lambda t: (t[1] + 1, t[0][0])).toDF(["line_no", "line"])


# ---------------------------------------------------------------------------
# decoders → entries(line_no, arr, map)
# ---------------------------------------------------------------------------


def decode(lines: DataFrame, decoder) -> DataFrame:
    if isinstance(decoder, RegexDecoder):
        return _decode_regex(lines, decoder.regex)
    if isinstance(decoder, JsonDecoder):
        return _decode_json(lines)
    raise PqError(f"unknown decoder {decoder!r}")


def decode_errors(lines: DataFrame, decoder) -> DataFrame:
    """Per-line decode errors → DF[line_no, error] — the ``-v`` channel
    (reference: src/runner.rs:138-146 prints them to stderr and skips).
    Message texts mirror the reference's error Display chain
    (error.rs:27-33, decoder.rs:47, regex.rs:22, json.rs:52-56); the inner
    serde_json message is approximated by Python's json error."""
    if isinstance(decoder, RegexDecoder):
        if decoder.regex == "":
            return lines.select("line_no", F.lit("x").alias("error")).limit(0)
        return lines.filter(~F.col("line").rlike(decoder.regex)).select(
            "line_no",
            F.lit("line decoding failed. Source error: no match found").alias("error"),
        )
    if isinstance(decoder, JsonDecoder):

        @pandas_udf("string")
        def _err(s: pd.Series) -> pd.Series:
            import json

            def one(line):
                try:
                    obj = json.loads(line)
                except (ValueError, TypeError) as e:
                    return (
                        "line decoding failed. Source error: "
                        f"JSON decoding failed. Source error: {e}"
                    )
                if not isinstance(obj, (list, dict)):
                    return (
                        "line decoding failed. Source error: "
                        "JSON decoder supports only flat arrays and objects"
                    )
                return None

            return s.map(one)

        return (
            lines.select("line_no", _err(F.col("line")).alias("error"))
            .filter(F.col("error").isNotNull())
        )
    raise PqError(f"unknown decoder {decoder!r}")


def _decode_regex(lines: DataFrame, pattern: str) -> DataFrame:
    """Regex decoder (reference: src/parse/decoding/regex.rs:18-34).

    Group 0 is skipped when the pattern has ≥1 capture group; non-matching
    lines are record errors (dropped). Pure JVM path: ``rlike`` +
    ``regexp_extract`` per group.
    """
    try:
        n_groups = _pyre.compile(pattern).groups
    except _pyre.error as e:
        raise PqError(f"bad regex pattern: {e}")

    if pattern == "":
        matched = F.lit(True)
    else:
        matched = F.col("line").rlike(pattern)

    if n_groups == 0:
        fields = [F.regexp_extract("line", pattern, 0)]
    else:
        fields = [F.regexp_extract("line", pattern, i) for i in range(1, n_groups + 1)]

    return (
        lines.filter(matched)
        .select(
            "line_no",
            F.array(*fields).alias("arr"),
            F.lit(None).cast("map<string,string>").alias("map"),
        )
    )


def _decode_json(lines: DataFrame) -> DataFrame:
    """JSON decoder (reference: src/parse/decoding/json.rs:48-59).

    Flat arrays → positional entries; flat objects → named entries; nested
    values dropped; bool/null/number stringified with serde parity.
    Arrow-batched pandas UDF (JSON shape is dynamic per line, so a static
    from_json schema can't replicate the reference's behavior).
    """

    @pandas_udf("struct<arr: array<string>, map: map<string,string>>")
    def _dec(s: pd.Series) -> pd.DataFrame:
        import json

        def scalar(v):
            if isinstance(v, bool):
                return "true" if v else "false"
            if v is None:
                return "null"
            if isinstance(v, (int, float)):
                if isinstance(v, int):
                    return str(v)
                r = repr(v)
                return r[:-2] if r.endswith(".0") else r
            if isinstance(v, str):
                return v
            return None  # nested → dropped

        arrs, maps = [], []
        for line in s:
            arr = mp = None
            try:
                obj = json.loads(line)
                if isinstance(obj, list):
                    arr = [x for x in (scalar(v) for v in obj) if x is not None]
                elif isinstance(obj, dict):
                    mp = {k: sv for k, v in obj.items() if (sv := scalar(v)) is not None}
            except (ValueError, TypeError):
                pass
            arrs.append(arr)
            maps.append(mp)
        return pd.DataFrame({"arr": arrs, "map": maps})

    dec = _dec(F.col("line"))
    return (
        lines.select("line_no", dec.alias("_e"))
        .select("line_no", F.col("_e.arr").alias("arr"), F.col("_e.map").alias("map"))
        .filter(F.col("arr").isNotNull() | F.col("map").isNotNull())
    )


# ---------------------------------------------------------------------------
# mapper → records(seq, ts, labels, values)
# ---------------------------------------------------------------------------


def _guess_ts_udf():
    @pandas_udf("long")
    def _guess(s: pd.Series) -> pd.Series:
        # fallback tail of the guess cascade: with the JVM half claiming
        # the common shapes, batches arrive mostly/entirely null — skip
        # them instead of running the per-element lambda on every row
        mask = s.notna()
        if not mask.any():
            return pd.Series([None] * len(s), index=s.index, dtype="Int64")
        out = pd.Series([None] * len(s), index=s.index, dtype="object")
        out[mask] = s[mask].map(
            lambda v: try_parse_time(v) if isinstance(v, str) else None
        )
        return out.astype("Int64")

    return _guess


_TS_MONTHS_RE = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"


def _ts_frac_ms(g):
    # g captures the fraction INCLUDING the dot; ≤3 digits by regex, so
    # right-padding to ms equals the Python cascade's round(frac*1000)
    return F.when(g == "", F.lit(0)).otherwise(
        F.rpad(F.substring(g, 2, 3), 3, "0").cast("int")
    )


def _ts_off_ms(g):
    # "+0200"-style numeric zone → signed offset ms
    sign = F.when(F.substring(g, 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    return sign * (
        F.substring(g, 2, 2).cast("int") * 3600
        + F.substring(g, 4, 2).cast("int") * 60
    ) * 1000


def _guess_ts_jvm(s):
    """JVM half of the format-guess cascade (reference:
    src/utils/time.rs:50-88): Unix ms for the shapes provably equal to
    ``try_parse_time``, NULL otherwise — the caller routes NULL rows to
    the Python cascade. Claim rules that keep the two paths identical:

    - fractions limited to ≤3 digits (longer ones need Python's
      round-to-ms); months/weekday pinned to the exact spellings the
      Python tables accept (Spark's ``MMM`` parse is case-INSENSITIVE,
      Python's nginx table is not — a case-variant month must fall
      through to Python, which rejects it);
    - year 0000 excluded everywhere (valid proleptic date for java.time,
      ``datetime`` raises — the fallback preserves the raise);
    - invalid dates inside a matching shape (Feb 30) parse to NULL via
      ``try_to_timestamp`` and fall back to Python, which raises exactly
      as before;
    - the shapes of the LATER cascade stages (nginx/ISO/unix digits) are
      disjoint from everything ``email.utils.parsedate_to_datetime``
      (stage 2) accepts, so shape-dispatch preserves cascade order.
    """
    # --- ISO family (RFC3339 / ISO±'T' / ISO + offset) ---
    # fixed-position core "yyyy-MM-dd[T ]HH:mm:ss": validated by
    # try_to_timestamp (digits, ranges, real calendar dates), so no
    # full-string regex is needed — only the variable TAIL (fraction /
    # zone, ≤10 chars) is regex-checked. A row whose tail doesn't match
    # yields NULL and falls back to the Python cascade, which re-tries
    # every format — misrouting can cost time, never correctness.
    core_iso = F.try_to_timestamp(
        F.concat(F.substring(s, 1, 10), F.lit(" "), F.substring(s, 12, 8)),
        F.lit("yyyy-MM-dd HH:mm:ss"),
    )
    sep = F.substring(s, 11, 1)
    tail = F.substring(s, 20, 32)
    T3339 = r"^(\.\d{1,3})?(Z|z|[+-]\d{2}:\d{2})$"
    TFRAC = r"^(\.\d{1,3})?$"
    TOFF = r"^(\.\d{1,3})? ([+-]\d{4})$"
    zone3339 = F.regexp_extract(tail, T3339, 2)
    off3339 = F.when(zone3339.isin("Z", "z"), F.lit(0)).otherwise(
        F.when(F.substring(zone3339, 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
        * (
            F.substring(zone3339, 2, 2).cast("int") * 3600
            + F.substring(zone3339, 5, 2).cast("int") * 60
        )
        * 1000
    )
    iso_ms = F.unix_millis(core_iso)
    v_iso = F.when(
        # year 0000 is a valid proleptic java.time date but raises in
        # datetime — leave it to the Python path (which raises, as before)
        (F.substring(s, 1, 4) != "0000") & iso_ms.isNotNull(),
        F.when(
            (sep == "T") & tail.rlike(T3339),
            iso_ms + _ts_frac_ms(F.regexp_extract(tail, T3339, 1)) - off3339,
        )
        .when(
            sep.isin("T", " ") & tail.rlike(TFRAC),
            iso_ms + _ts_frac_ms(F.regexp_extract(tail, TFRAC, 1)),
        )
        .when(
            (sep == " ") & tail.rlike(TOFF),
            iso_ms
            + _ts_frac_ms(F.regexp_extract(tail, TOFF, 1))
            - _ts_off_ms(F.regexp_extract(tail, TOFF, 2)),
        ),
    )

    # --- nginx "dd/Mon/yyyy:HH:mm:ss +zzzz" — fully positional ---
    # month pinned to the EXACT proper-case spellings the Python table
    # accepts (Spark's MMM parse is case-insensitive, the table is not)
    ngx_zone = F.substring(s, 22, 5)
    v_nginx = F.when(
        (F.length(s) == 26)
        & F.substring(s, 4, 3).isin(*_TS_MONTHS_RE.split("|"))
        & (F.substring(s, 8, 4) != "0000")
        & (F.substring(s, 21, 1) == " ")
        & ngx_zone.rlike(r"^[+-]\d{4}$"),
        F.unix_millis(
            F.try_to_timestamp(F.substring(s, 1, 20), F.lit("dd/MMM/yyyy:HH:mm:ss"))
        )
        - _ts_off_ms(ngx_zone),
    )

    # --- unix seconds / millis (10 / 13 digits) ---
    v_unix = F.when(s.rlike(r"^\d{10}$"), s.cast("long") * 1000).otherwise(
        F.when(s.rlike(r"^\d{13}$"), s.cast("long"))
    )

    # structural pre-dispatch: each shape implies one cheap substring
    # fact, so a row attempts ~one family instead of all of them.
    # RFC2822 is deliberately NOT claimed: a JVM expression for it (split
    # + field checks + try_to_timestamp) pushed the generated whole-stage
    # method past the JIT's compile threshold and the whole projection
    # ran as interpreted bytecode — 3x SLOWER than the Python cascade
    # (measured: 2.8 s vs 1.1 s / 2M rows). parsedate rows ride the
    # masked Python fallback at the old path's cost.
    return (
        F.when(F.substring(s, 5, 1) == "-", v_iso)  # yyyy-…
        .when(F.substring(s, 3, 1) == "/", v_nginx)  # dd/Mon/yyyy:…
        .when(
            F.length(s).isin(10, 13) & F.substring(s, 1, 1).isin(*"0123456789"),
            v_unix,
        )
    )


def _explicit_ts_udf(fmt: str):
    @pandas_udf("long")
    def _parse(s: pd.Series) -> pd.Series:
        def one(v):
            if not isinstance(v, str):
                return None
            try:
                return parse_time(v, fmt)
            except Exception:
                return None

        return s.map(one).astype("Int64")

    return _parse


def _ts_expr(datum, fmt: str | None):
    if fmt is None:
        # JVM shapes first (codegen'd, no Python boundary); only rows no
        # JVM shape claims reach the pandas cascade, and they arrive
        # MASKED — claimed rows cross the Arrow boundary as nulls, so the
        # Python side does ~no per-element work on a typical log corpus
        jvm = _guess_ts_jvm(datum)
        return F.coalesce(jvm, _guess_ts_udf()(F.when(jvm.isNull(), datum)))
    java = strptime_to_java(fmt)
    if java is not None:
        return F.unix_millis(F.try_to_timestamp(datum, F.lit(java)))
    return _explicit_ts_udf(fmt)(datum)


def map_records(
    entries: DataFrame,
    mapper: Mapper,
    since_ms: int | None = None,
    until_ms: int | None = None,
) -> DataFrame:
    """Apply the ``map { … }`` clause (reference:
    src/parse/mapping/strategy.rs:17-93) producing typed records.

    Per-record errors (missing field, failed num/ts parse, entry-kind
    mismatch) drop the record, matching the reference's skip-on-error loop
    (src/runner.rs:150-157). The ``--since``/``--until`` range filter is a
    plain timestamp predicate (partition-prunable at scale).
    """
    datum_cols = {}
    valid = F.lit(True)
    ts_col = F.lit(None).cast("long")
    label_entries = []
    value_entries = []

    for i, fld in enumerate(mapper.fields):
        if fld.typ == "const":
            label_entries.append(
                F.struct(
                    F.lit(fld.end_name).alias("key"),
                    F.lit(fld.const_value).alias("value"),
                )
            )
            continue

        if isinstance(fld.loc, int):
            datum = F.get(F.col("arr"), fld.loc)  # NULL on OOB even under ANSI; try_element_at trips a Janino codegen bug (interpreted fallback)
            valid = valid & F.col("arr").isNotNull()
        else:
            datum = F.col("map").getItem(fld.loc)
            valid = valid & F.col("map").isNotNull()
        dname = f"_d{i}"
        datum_cols[dname] = datum
        datum = F.col(dname)

        if fld.typ == "str":
            valid = valid & datum.isNotNull()
            label_entries.append(
                F.struct(F.lit(fld.end_name).alias("key"), datum.alias("value"))
            )
        elif fld.typ == "num":
            num = datum.try_cast("double")
            valid = valid & num.isNotNull()
            value_entries.append(
                F.struct(F.lit(fld.end_name).alias("key"), num.alias("value"))
            )
        elif fld.typ == "auto":
            # numeric ⇒ value, else ⇒ label (strategy.rs:31-38)
            num = datum.try_cast("double")
            valid = valid & datum.isNotNull()
            value_entries.append(
                F.when(
                    num.isNotNull(),
                    F.struct(F.lit(fld.end_name).alias("key"), num.alias("value")),
                )
            )
            label_entries.append(
                F.when(
                    num.isNull() & datum.isNotNull(),
                    F.struct(F.lit(fld.end_name).alias("key"), datum.alias("value")),
                )
            )
        elif fld.typ == "ts":
            if fld.ts_format is None:
                # stage the JVM cascade as a REAL column: referencing the
                # expression from both the fallback mask and the coalesce
                # would evaluate the 6-regex tree twice (once below, once
                # above the ArrowEvalPython node — no CSE across it)
                jname, pname = f"_tsj{i}", f"_tsp{i}"
                datum_cols[jname] = _guess_ts_jvm(datum)
                j = F.col(jname)
                datum_cols[pname] = F.coalesce(
                    j, _guess_ts_udf()(F.when(j.isNull(), datum))
                )
                parsed = F.col(pname)
            else:
                parsed = _ts_expr(datum, fld.ts_format)
            valid = valid & datum.isNotNull() & parsed.isNotNull()
            ts_col = parsed
        else:  # pragma: no cover
            raise PqError(f"unknown field type {fld.typ}")

    df = entries
    for name, col in datum_cols.items():
        df = df.withColumn(name, col)

    def entries_map(entries_list, empty, value_type):
        if not entries_list:
            return empty
        return F.map_from_entries(
            F.filter(F.array(*entries_list), lambda x: x.isNotNull())
        )

    rec = df.select(
        F.col("line_no").alias("seq"),
        ts_col.alias("ts"),
        entries_map(label_entries, _empty_map("string"), "string").alias("labels"),
        entries_map(value_entries, _empty_map("double"), "double").alias("values"),
        valid.alias("_valid"),
    ).filter(F.col("_valid")).drop("_valid")

    # --since / --until (reference: src/parse/mapping/mapper.rs:45-54):
    # untimestamped records pass both checks.
    if since_ms is not None:
        rec = rec.filter(F.col("ts").isNull() | (F.col("ts") >= F.lit(since_ms)))
    if until_ms is not None:
        rec = rec.filter(F.col("ts").isNull() | (F.col("ts") <= F.lit(until_ms)))
    return rec


def map_errors(entries: DataFrame, mapper: Mapper) -> DataFrame:
    """Per-entry mapping errors → DF[line_no, error] — the ``-v`` channel.

    Mirrors the reference's first-failing-field semantics and message texts
    (src/parse/mapping/strategy.rs:43,64,73,77-81,90; utils/time.rs:41):
    the mapper iterates fields in declaration order and returns on the
    first error, so a chained when() in the same order reproduces both the
    dropped set and the reported message."""
    err = F.lit(None).cast("string")
    staged = entries

    def first_err(*cases):
        nonlocal err
        for cond, msg in cases:
            err = F.when(err.isNotNull(), err).otherwise(
                F.when(cond, F.lit(msg))
            )

    for fi, fld in enumerate(mapper.fields):
        if fld.typ == "const":
            continue
        if isinstance(fld.loc, int):
            datum = F.get(F.col("arr"), fld.loc)  # NULL on OOB even under ANSI; try_element_at trips a Janino codegen bug (interpreted fallback)
            first_err(
                (F.col("arr").isNull(), "dict entry cannot be mapped with positional fields"),
                (datum.isNull(), "tuple entry index out of range"),
            )
        else:
            datum = F.col("map").getItem(fld.loc)
            first_err(
                (F.col("map").isNull(), "tuple entry cannot be mapped with named fields"),
                (datum.isNull(), "dict entry field not found"),
            )
        if fld.typ == "num":
            first_err((datum.try_cast("double").isNull(), "could not parse numeric field"))
        elif fld.typ == "ts":
            if fld.ts_format is None:
                # stage like map_records: one JVM-cascade evaluation, one
                # masked Python fallback
                jname, pname = f"_etsj{fi}", f"_etsp{fi}"
                staged = staged.withColumn(jname, _guess_ts_jvm(datum))
                j = F.col(jname)
                staged = staged.withColumn(
                    pname,
                    F.coalesce(j, _guess_ts_udf()(F.when(j.isNull(), datum))),
                )
                parsed = F.col(pname)
            else:
                parsed = _ts_expr(datum, fld.ts_format)
            msg = (
                "couldn't guess time format"
                if fld.ts_format is None
                else "couldn't parse timestamp"
            )
            first_err((parsed.isNull(), msg))

    return (
        staged.select("line_no", err.alias("error"))
        .filter(F.col("error").isNotNull())
    )


# ---------------------------------------------------------------------------
# records → samples (the unpivot / fan-out)
# ---------------------------------------------------------------------------


def samples_from_records(records: DataFrame) -> DataFrame:
    """Record → sample fan-out (reference: src/query/sample.rs:75-113):
    one sample per value entry plus the synthetic ``__line__`` metric;
    records without a timestamp are silently dropped (sample.rs:88)."""
    with_line = records.filter(F.col("ts").isNotNull()).select(
        "seq",
        "ts",
        "labels",
        F.map_concat(
            F.map_filter(F.col("values"), lambda k, _: k != F.lit(LINE_METRIC)),
            F.create_map(F.lit(LINE_METRIC), F.col("seq").cast("double")),
        ).alias("values"),
    )
    exploded = with_line.select(
        "seq", "ts", "labels", F.explode("values").alias("name", "value")
    )
    return exploded.select(
        "seq",
        "ts",
        "name",
        F.map_concat(
            F.map_filter(F.col("labels"), lambda k, _: k != F.lit(NAME_LABEL)),
            F.create_map(F.lit(NAME_LABEL), F.col("name")),
        ).alias("labels"),
        "value",
    )


def static_sig_expr(entries: dict[str, "Column"]) -> "Column":
    """``sig_expr`` specialized for a label set whose KEYS are known at
    plan time (table ingest: label_cols + __name__): the sorted
    key\\xffvalue concatenation becomes a plain string concat — no map
    build, no array_sort, no lambda transform per row.  Null-value pairs
    contribute nothing, matching ``array_join``'s null-element skip.
    Key order: Python's codepoint sort == Spark's binary string sort
    (UTF-8 byte order preserves codepoint order).  Equivalence is pinned
    in tests/test_rollup.py against ``sig_expr`` on the same rows."""
    pieces = [
        F.when(entries[k].isNull(), F.lit("")).otherwise(
            F.concat(F.lit(k + "\xff"), entries[k])
        )
        for k in sorted(entries)
    ]
    return F.concat(*pieces) if pieces else F.lit("")


def _table_base(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    label_cols: list[str],
    seq_col: str | None,
    ts_unit: str,
) -> DataFrame:
    """Shared typed projection for table ingest: (seq, ts, labels…, values…)
    with nulls-after-cast semantics identical between ``samples_from_table``
    and ``series_dim_for_table`` (the dim fast path must see exactly the
    rows the union branches would keep)."""
    ts = F.unix_millis(F.col(ts_col)) if ts_unit == "timestamp" else F.col(ts_col).cast("long")
    seq = F.col(seq_col).cast("long") if seq_col else F.monotonically_increasing_id()
    return df.select(
        seq.alias("seq"),
        ts.alias("ts"),
        *[F.col(c).cast("string").alias(c) for c in label_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    ).filter(F.col("ts").isNotNull())


def series_dim_for_table(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    label_cols: list[str],
    seq_col: str | None = None,
    ts_unit: str = "timestamp",
    with_line_metric: bool = True,
) -> DataFrame:
    """Series label space of ``samples_from_table(df, …)`` WITHOUT scanning
    the (rows × metrics) sample union: one narrow aggregate over the base
    rows collapses to the distinct label combos (map-side combine makes the
    shuffle dim-sized), then the per-metric dim rows are built on the tiny
    result. Equivalence contract: a (labels, metric) series exists iff ≥1
    base row has that label combo and a non-null value for the metric (the
    union branch's ``value.isNotNull()`` filter); ``__line__``'s value is
    ``seq``, so its presence flag is ``seq IS NOT NULL``.

    Returns (name, labels) rows — the same shape ``series_dim`` derives
    from wide samples (the caller attaches sig/skey).
    """
    base = _table_base(df, ts_col, value_cols, label_cols, seq_col, ts_unit)
    flag_cols = list(value_cols) + (["seq"] if with_line_metric else [])
    combos = base.groupBy(*label_cols).agg(
        *[F.max(F.col(c).isNotNull()).alias(f"_has_{c}") for c in flag_cols]
    )
    metrics = [(m, f"_has_{m}") for m in value_cols]
    if with_line_metric:
        metrics.append((LINE_METRIC, "_has_seq"))

    label_map_of = lambda name: F.map_concat(  # noqa: E731
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in label_cols]),
            F.array(*[F.col(c) for c in label_cols]),
        )
        if label_cols
        else _empty_map("string"),
        F.create_map(F.lit(NAME_LABEL), F.lit(name)),
    )
    parts = [
        combos.filter(F.col(flag)).select(
            F.lit(m).alias("name"), label_map_of(m).alias("labels")
        )
        for m, flag in metrics
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def samples_from_table(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    label_cols: list[str],
    seq_col: str | None = None,
    ts_unit: str = "timestamp",
    with_line_metric: bool = True,
) -> DataFrame:
    """Scale-path ingest: a columnar table → samples, no decoding.

    This is how the north-rule corpus enters the engine: e.g. the page table
    ``(url, warc_ts, html, text, lang)`` maps to labels {lang, domain},
    values {text_len, content_len} with ``ts = warc_ts`` in ms. Pure
    column expressions — fully prunable/pushable by Catalyst.

    ts_unit: 'timestamp' (native timestamp col) | 'ms' (already epoch ms).
    """
    base = _table_base(df, ts_col, value_cols, label_cols, seq_col, ts_unit)

    # unpivot as a UNION ALL of literal-named branches instead of stack():
    # a metric-name selector (filter name = '<m>') constant-folds each
    # branch's predicate, so Catalyst prunes the non-selected branches AND
    # their scans — a single-metric query reads ONE value column with no
    # Generate/Expand node. Trade-off: a query touching k metrics plans k
    # column-pruned scans of the source instead of one wide scan; pq
    # queries select one metric per selector, so pruning wins.
    def _branch(name_lit: str, value_col: Column) -> DataFrame:
        return base.select(
            "seq",
            "ts",
            *label_cols,
            F.lit(name_lit).alias("name"),
            value_col.alias("value"),
        ).filter(F.col("value").isNotNull())

    branches = [_branch(m, F.col(m).cast("double")) for m in value_cols]
    if with_line_metric:
        branches.append(_branch(LINE_METRIC, F.col("seq").cast("double")))
    unpivoted = branches[0]
    for b in branches[1:]:
        unpivoted = unpivoted.unionByName(b)

    label_map = F.map_concat(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in label_cols]),
            F.array(*[F.col(c) for c in label_cols]),
        )
        if label_cols
        else _empty_map("string"),
        F.create_map(F.lit(NAME_LABEL), F.col("name")),
    )
    # keep the raw label columns as `_lbl_<name>` passthroughs: label
    # matchers filter on plain columns instead of map lookups, so Catalyst
    # can push them into the parquet/Iceberg scan (partition pruning on
    # e.g. lang/domain) — the map column exists for generic label access
    return unpivoted.select(
        "seq", "ts", "name", label_map.alias("labels"), "value",
        *[F.col(c).alias(f"_lbl_{c}") for c in label_cols],
        # precomputed series signature: keys are static here, so the sig is
        # a plain concat — consumers that key rows by series (the rollup
        # pipeline's fact projection) use it instead of re-deriving
        # sig_expr(labels) per row (map build + sort + transform)
        static_sig_expr(
            {NAME_LABEL: F.col("name"), **{c: F.col(c) for c in label_cols}}
        ).alias("_sig"),
    )
