"""Per-partition lineage manifests + checkpoint/resume writes.

North-rule requirement: every rollup stage writes per-partition lineage
manifests and metrics alongside its table snapshots so a failed stage
resumes from checkpoint WITHOUT recomputation.

Mechanism (storage-format agnostic — parquet here; the manifest protocol is
what Iceberg's snapshot summary would carry, and ``TierStore`` is the seam
where an Iceberg catalog writer slots in — this sandbox has no Iceberg
runtime jars, so tables are parquet directories):

- each output table is date-partitioned (``date=YYYY-MM-DD``);
- before writing, the input slice for each partition is fingerprinted
  DISTRIBUTEDLY: ``(row_count, sum(xxhash64(row-identity)))`` — an
  order-independent, partitioning-independent digest computed in the same
  Spark pass (one tiny aggregate, no extra scan of written data);
- a partition is (re)written only when its manifest is missing or its
  input fingerprint changed; rewrites use dynamic partition overwrite so
  untouched partitions' files are never rewritten;
- the manifest JSON per partition records the fingerprint, row counts, and
  stage metrics; ``_snapshots/`` keeps an append-only log of every commit
  (which partitions were written vs skipped) — the resume audit trail.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

SCHEMA_VERSION = 2  # v2: overflow-proof xor digest (v1 summed 64-bit hashes)


@dataclass
class CommitResult:
    table_path: str
    written: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


class TierStore:
    """Date-partitioned parquet table with lineage manifests + resume."""

    def __init__(self, base_path: str):
        self.base_path = base_path

    # -- manifest I/O --------------------------------------------------------

    def _lineage_dir(self, table: str) -> str:
        return os.path.join(self.base_path, table, "_lineage")

    def _manifest_path(self, table: str, part: str) -> str:
        return os.path.join(self._lineage_dir(table), f"{part}.json")

    def read_manifest(self, table: str, part: str) -> dict | None:
        p = self._manifest_path(table, part)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, table: str, part: str, manifest: dict) -> None:
        os.makedirs(self._lineage_dir(table), exist_ok=True)
        tmp = self._manifest_path(table, part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, self._manifest_path(table, part))

    def _append_snapshot(self, table: str, entry: dict) -> None:
        d = os.path.join(self.base_path, table, "_snapshots")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "log.jsonl"), "a") as f:
            f.write(json.dumps(entry, sort_keys=True) + "\n")

    # -- fingerprint -----------------------------------------------------------

    @staticmethod
    def fingerprints(df: DataFrame, part_col: str = "date") -> dict[str, dict]:
        """Order/partitioning-independent digest per partition value:
        one distributed aggregate, no collect of data rows.

        The digest is (rows, bit_xor(h1), bit_xor(h2)) with two
        independently-seeded xxhash64 row hashes — xor never overflows
        (summing uniform 64-bit hashes overflows long almost surely, which
        ANSI mode turns into ARITHMETIC_OVERFLOW). Caveat shared by any xor
        digest: a row repeated an even number of times cancels out — tier
        tables are unique-keyed per partition, and the row count catches
        pure duplications."""
        id_cols = [c for c in df.columns if c != part_col and c != "labels"]
        h1 = F.xxhash64(*id_cols)
        h2 = F.xxhash64(F.lit("fp2"), *id_cols)
        digest = (
            df.select(part_col, h1.alias("_h1"), h2.alias("_h2"))
            .groupBy(part_col)
            .agg(
                F.count("*").alias("rows"),
                F.expr("bit_xor(_h1)").alias("x1"),
                F.expr("bit_xor(_h2)").alias("x2"),
            )
        )
        return {
            r[part_col]: {
                "rows": r["rows"],
                "hashsum": f"{r['x1']}:{r['x2']}",
            }
            for r in digest.collect()
        }

    # -- commit ------------------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        table: str,
        part_col: str = "date",
        stage_metrics: dict | None = None,
    ) -> CommitResult:
        """Write only partitions whose input fingerprint changed."""
        t0 = time.time()
        # the engine's session confs (ANSI off, UTC, AQE) must hold for the
        # fingerprint/write jobs even on a default (ANSI-on) session
        from ..engine.runner import configure_session

        configure_session(df.sparkSession)
        # the input plan is evaluated twice (fingerprint pass + write pass) —
        # persist so expensive upstreams (salted aggs, Gorilla packing) run once
        df = df.persist()
        fps = self.fingerprints(df, part_col)
        result = CommitResult(table_path=os.path.join(self.base_path, table))

        stale = []
        for part, fp in sorted(fps.items()):
            m = self.read_manifest(table, str(part))
            if m and m.get("fingerprint") == fp and m.get("schema_version") == SCHEMA_VERSION:
                result.skipped.append(str(part))
            else:
                stale.append(part)

        if stale:
            out = df.filter(F.col(part_col).isin([p for p in stale]))
            spark = df.sparkSession
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    # repartition by the partition value: one writer set per
                    # partition instead of (tasks × partitions) small files
                    out.repartition(F.col(part_col))
                    .write.mode("overwrite")
                    .partitionBy(part_col)
                    .parquet(result.table_path)
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

            for part in stale:
                self._write_manifest(
                    table,
                    str(part),
                    {
                        "partition": str(part),
                        "fingerprint": fps[part],
                        "schema_version": SCHEMA_VERSION,
                        "written_at": time.time(),
                        "metrics": stage_metrics or {},
                    },
                )
                result.written.append(str(part))

        df.unpersist()
        result.metrics = {
            "partitions_total": len(fps),
            "partitions_written": len(result.written),
            "partitions_skipped": len(result.skipped),
            "rows_total": int(sum(fp["rows"] for fp in fps.values())),
            "elapsed_s": round(time.time() - t0, 3),
            **(stage_metrics or {}),
        }
        self._append_snapshot(
            table,
            {
                "ts": time.time(),
                "written": result.written,
                "skipped": result.skipped,
                "metrics": result.metrics,
            },
        )
        return result

    def read(self, spark, table: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.base_path, table))


def with_date(df: DataFrame, ts_col: str = "bucket_ts") -> DataFrame:
    return df.withColumn(
        "date", F.date_format(F.timestamp_millis(F.col(ts_col)), "yyyy-MM-dd")
    )
