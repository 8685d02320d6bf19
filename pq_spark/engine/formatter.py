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
        per_series = (
            result.points.groupBy("instant", "sig")
            .agg(
                F.sort_array(F.collect_list(F.struct("ts", "seq", "value"))).alias("_pts"),
                F.min_by("labels", F.struct("ts", "seq")).alias("labels"),
                F.first("ord").alias("ord"),
            )
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
    """JSON formatter for decoder-only programs: tuple entries render as an
    array, dict entries as a sorted-key object (serde BTreeMap parity)."""
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
    """JSON formatter for mapper-only programs: labels as strings, values as
    f64, timestamp in ms — sorted keys (reference: src/format/json.rs)."""
    rows = records.orderBy("seq").collect()
    out = []
    for r in rows:
        obj: dict = {}
        obj.update(dict(r["labels"]))
        for k, v in (r["values"] or {}).items():
            obj[k] = v
        if r["ts"] is not None:
            obj["timestamp"] = r["ts"]
        out.append(json.dumps(dict(sorted(obj.items())), separators=(",", ":"),
                              ensure_ascii=False))
    return out
