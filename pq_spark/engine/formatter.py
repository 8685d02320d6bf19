"""Output formatters — byte-parity with the reference.

``to_promapi`` (reference: src/format/promapi.rs) is the golden-output
format: one JSON line per grid instant. The heavy lifting (metric-JSON
rendering, per-instant grouping, ordering) happens JVM-side; only the final
small per-instant rows are collected, where Python applies the Rust float
formatting (``rust_f64_str`` / ``json_f64_str``).

``to_json`` (reference: src/format/json.rs) renders entries/records as
sorted-key JSON objects and delegates query values to the promapi format.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from ..errors import MatchingError
from ..floatfmt import json_f64_str, rust_f64_str
from .frames import Check, RangeFrame, ScalarResult, VectorFrame


def _run_checks(checks: list[Check]) -> None:
    for c in checks:
        if c.df.limit(1).count() > 0:
            raise MatchingError(c.message)


def _metric_json_col() -> F.Column:
    # sorted label keys, JVM-side JSON escaping (serde_json parity: compact,
    # UTF-8, standard control escapes)
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(F.col("labels")))))


def promapi_lines(result, strict_checks: bool = True) -> list[str]:
    """Serialize a query result to promapi JSON lines (one per instant)."""
    if isinstance(result, ScalarResult):
        # scalar ts hardcoded 0.0 and emitted exactly once
        # (promapi.rs:114-121, evaluator.rs:58-68 drain hack)
        return [
            '{"resultType":"scalar","result":[0.0,"%s"]}' % rust_f64_str(result.value)
        ]

    if strict_checks:
        _run_checks(result.checks)

    if isinstance(result, VectorFrame):
        cells = result.cells.withColumn("_mj", _metric_json_col())
        rows = (
            result.grid.join(cells, "instant", "left")
            .groupBy("instant")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("ord").isNotNull(),
                            F.struct("ord", "_mj", "value"),
                        )
                    )
                ).alias("items")
            )
            .orderBy("instant")
            .collect()
        )
        lines = []
        for row in rows:
            ts_str = json_f64_str(row["instant"] / 1000.0)
            items = ",".join(
                '{"metric":%s,"value":[%s,"%s"]}'
                % (it["_mj"], ts_str, rust_f64_str(it["value"]))
                for it in row["items"]
            )
            lines.append('{"resultType":"vector","result":[%s]}' % items)
        return lines

    if isinstance(result, RangeFrame):
        # narrow aggregation (packed _okey keeps it in HashAggregate); the
        # series dim joins back broadcast-style after the per-window collect
        per_series = (
            result.facts.groupBy("instant", "skey")
            .agg(
                F.sort_array(F.collect_list(F.struct("_okey", "ts", "value"))).alias("_pts"),
            )
            .join(F.broadcast(result.dim), "skey")
            .withColumn("_mj", _metric_json_col())
        )
        rows = (
            result.grid.join(per_series, "instant", "left")
            .groupBy("instant")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("ord").isNotNull(),
                            F.struct("ord", "_mj", "_pts"),
                        )
                    )
                ).alias("items")
            )
            .orderBy("instant")
            .collect()
        )
        lines = []
        for row in rows:
            items = []
            for it in row["items"]:
                values = ",".join(
                    '[%s,"%s"]' % (json_f64_str(p["ts"] / 1000.0), rust_f64_str(p["value"]))
                    for p in it["_pts"]
                )
                items.append('{"metric":%s,"values":[%s]}' % (it["_mj"], values))
            lines.append('{"resultType":"matrix","result":[%s]}' % ",".join(items))
        return lines

    raise TypeError(f"cannot format {type(result)}")


# ---------------------------------------------------------------------------
# entry/record formatters (decoder-only and mapper-only programs)
# ---------------------------------------------------------------------------


def entries_json_lines(entries: DataFrame) -> list[str]:
    """JSON formatter for decoder-only programs (reference:
    src/format/json.rs:49-66): tuple entries render as a JSON array; dict
    entries as an object (we emit sorted keys — the reference serializes a
    HashMap whose order is arbitrary, so sorted is the deterministic
    choice)."""
    rows = entries.orderBy("line_no").collect()
    out = []
    for r in rows:
        if r["arr"] is not None:
            out.append(json.dumps(list(r["arr"]), separators=(",", ":"), ensure_ascii=False))
        else:
            out.append(
                json.dumps(dict(sorted(r["map"].items())), separators=(",", ":"),
                           ensure_ascii=False)
            )
    return out


def records_json_lines(records: DataFrame) -> list[str]:
    """JSON formatter for mapper-only programs (reference:
    src/format/json.rs:25-33,69-83): ``{"timestamp": ms?, "labels": {...},
    "values": {...}}`` with sorted inner keys; timestamp omitted if the
    record has none."""
    rows = records.orderBy("seq").collect()
    out = []
    for r in rows:
        obj: dict = {}
        if r["ts"] is not None:
            obj["timestamp"] = r["ts"]
        obj["labels"] = dict(sorted((r["labels"] or {}).items()))
        obj["values"] = dict(sorted((r["values"] or {}).items()))
        out.append(json.dumps(obj, separators=(",", ":"), ensure_ascii=False))
    return out


# ---------------------------------------------------------------------------
# human-readable formatter (the default when no formatter stage is given;
# reference: src/format/humanreadable.rs)
# ---------------------------------------------------------------------------


def _ts_human(ts_ms: int) -> str:
    """``to_string_millis`` parity — NOTE the reference floors to seconds
    and always prints ``.000`` (timestamp.rs:33-36)."""
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(ts_ms // 1000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + ".000"


def _dict_human(d: dict, sep: str) -> str:
    return sep.join(f"{k}={v}" for k, v in sorted(d.items()))


def entries_human_lines(entries: DataFrame) -> list[str]:
    rows = entries.orderBy("line_no").collect()
    out = []
    for r in rows:
        if r["arr"] is not None:
            out.append("\t".join(r["arr"]))
        else:
            out.append(_dict_human(dict(r["map"]), "\t"))
    return out


def records_human_lines(records: DataFrame) -> list[str]:
    rows = records.orderBy("seq").collect()
    out = []
    for r in rows:
        parts = []
        if r["ts"] is not None:
            parts.append(_ts_human(r["ts"]))
        if r["labels"]:
            parts.append(_dict_human(dict(r["labels"]), "\t"))
        if r["values"]:
            parts.append(
                _dict_human({k: rust_f64_str(v) for k, v in r["values"].items()}, "\t")
            )
        out.append("\t".join(parts))
    return out


def promhuman_lines(result, strict_checks: bool = True) -> list[str]:
    """Human formatter for query values (humanreadable.rs:70-177).
    Non-verbose: empty vectors produce NO output line."""
    if isinstance(result, ScalarResult):
        return [rust_f64_str(result.value)]
    if strict_checks:
        _run_checks(result.checks)

    NAME = "__name__"
    lines: list[str] = []
    if isinstance(result, VectorFrame):
        rows = result.cells.orderBy("instant", "ord").collect()
        for r in rows:
            labels = dict(r["labels"])
            name = labels.pop(NAME, None)
            parts = [_ts_human(r["instant"]) + "\t"]
            if name is not None:
                parts.append(name)
            if labels or name is not None:
                parts.append("{%s}\t\t\t" % _dict_human(labels, ", "))
            parts.append(rust_f64_str(r["value"]))
            lines.append("".join(parts))
        return lines

    if isinstance(result, RangeFrame):
        per_series = (
            result.facts.groupBy("instant", "skey")
            .agg(
                F.sort_array(F.collect_list(F.struct("_okey", "ts", "value"))).alias("_pts"),
            )
            .join(F.broadcast(result.dim), "skey")
            .orderBy("instant", "ord")
            .collect()
        )
        for r in per_series:
            labels = dict(r["labels"])
            name = labels.pop(NAME, None)
            parts = [_ts_human(r["instant"]) + "\t"]
            if name is not None:
                parts.append(name)
            if labels or name is not None:
                parts.append("{%s}\t\t\t" % _dict_human(labels, ", "))
            lines.append("".join(parts))
            for p in r["_pts"]:
                lines.append("\t%s @ %s" % (rust_f64_str(p["value"]), _ts_human(p["ts"])))
        return lines

    raise TypeError(f"cannot format {type(result)}")
