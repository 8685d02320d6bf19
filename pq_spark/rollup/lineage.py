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

Snapshot isolation (round-4 verdict item 7 — the two Iceberg semantics the
catalog seam needs, delivered reader-side):

- data files are immutable: each commit writes its changed partitions under
  a fresh ``data/<commit-id>/date=.../`` directory — nothing is overwritten
  in place, so files referenced by an existing snapshot never change;
- a numbered snapshot manifest ``_snapshots/v<N>.json`` maps every live
  partition to its concrete data directory (unchanged partitions carry
  their previous paths forward), and ``_snapshots/CURRENT`` is swapped to
  ``N`` with an atomic rename only after the manifest is complete — a
  reader that opens mid-commit resolves the PREVIOUS complete snapshot;
- ``read(..., snapshot_id=K)`` time-travels to any retained snapshot;
- concurrent writers converge without a catalog CAS: each commit composes
  its snapshot from a scan of ALL per-partition manifests and then
  re-checks that CURRENT's content matches a fresh scan, swapping again if
  a concurrent commit raced it (bounded retries; manifests only grow, so
  the last re-check in wall-clock order certifies the final state).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

SCHEMA_VERSION = 2  # v2: overflow-proof xor digest (v1 summed 64-bit hashes)


class StoreCorruptionError(RuntimeError):
    """A lineage manifest references data that no longer exists — the store
    needs operator repair (message carries the hint); commits/publishes on
    the affected table refuse to proceed rather than publish a snapshot
    missing a live partition."""


@dataclass
class CommitResult:
    table_path: str
    written: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)
    # staged manifest/snapshot writes of a publish=False commit, applied
    # by TierStore.finalize_commit once the caller's invariants have held
    pending: dict | None = None


class TierStore:
    """Date-partitioned parquet table with lineage manifests + resume."""

    def __init__(self, base_path: str, target_rows_per_file: int = 1_000_000):
        self.base_path = base_path
        # writer-split granularity floor: a stale partition is sharded over
        # ceil(rows / target_rows_per_file) writer tasks, capped at the
        # session parallelism. Big partitions (1m tier, Gorilla blocks)
        # keep every writer core busy; small cascade tiers (1h/1d) stop
        # paying a parallelism-way tiny-file tax. Row counts come free
        # from the fingerprint pass, so the width is exact, not guessed.
        # Default sizes OUTPUT FILES for readers (guide §6: 128 MB-1 GB
        # parquet files): tier rows are ~150-250 B, so 1M rows ≈
        # 150-250 MB per file. The parallelism cap still bounds writer
        # width, and a date bigger than parallelism × target splits into
        # parallelism-many larger files rather than unbounded task counts.
        # (The old 4096-row default emitted ~1 MB files — a metadata and
        # file-open tax on every downstream scan at any realistic scale.)
        self.target_rows_per_file = target_rows_per_file

    # writer-balance floor: a partition with >= k × this many rows may use
    # up to k writer cores even when that makes files smaller than
    # target_rows_per_file (never smaller than this floor, ~10-16 MB at
    # tier row widths) — commit() takes max(size width, balance width)
    MIN_ROWS_PER_FILE = 65536

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

    # -- snapshot manifests (reader-side isolation + time travel) -------------

    def _snapshots_dir(self, table: str) -> str:
        return os.path.join(self.base_path, table, "_snapshots")

    def _scan_manifest_parts(self, table: str) -> dict[str, str]:
        """Partition → relative data dir, from the per-partition manifests
        (the writer-side source of truth; a manifest is written only after
        its partition's data files are complete).

        Pure read — the publish retry loop calls this repeatedly and must
        never mutate the store it is scanning. Legacy manifests (pre-
        snapshot-isolation, no ``data_path``) are RESOLVED in memory to
        their root-relative ``date=<part>`` dir so every snapshot still
        carries every live partition; the durable rewrite is an explicit
        migration (:meth:`migrate_legacy_manifests`). A legacy manifest
        whose data dir is gone is store corruption — surfaced as
        :class:`StoreCorruptionError` with a repair hint rather than
        publishing a silently-shrunk snapshot."""
        d = self._lineage_dir(table)
        parts: dict[str, str] = {}
        if not os.path.isdir(d):
            return parts
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".json") or fn.endswith(".tmp"):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):  # mid-rename straggler
                continue
            if m.get("data_path"):
                parts[m["partition"]] = m["data_path"]
            elif m.get("partition") is not None:
                legacy_rel = f"date={m['partition']}"
                root = os.path.join(self.base_path, table)
                if not os.path.isdir(os.path.join(root, legacy_rel)):
                    raise StoreCorruptionError(
                        f"manifest {fn} of table {table!r} has no data_path "
                        f"and no legacy data dir {legacy_rel!r} — refusing "
                        "to publish a snapshot missing a live partition. "
                        "Repair: restore the data dir, or delete the orphan "
                        f"manifest {os.path.join(d, fn)!r} if the partition "
                        "is truly gone, then re-run the commit."
                    )
                parts[m["partition"]] = legacy_rel
        return parts

    def migrate_legacy_manifests(self, table: str) -> dict[str, list[str]]:
        """One-shot upgrade of a pre-snapshot-isolation store: durably
        backfill ``data_path`` into every legacy manifest whose data dir is
        live, and REPORT (not raise) orphans so an operator can repair a
        store that the hot publish path refuses to touch. Returns
        ``{"migrated": [...], "orphaned": [...]}`` partition lists."""
        d = self._lineage_dir(table)
        out: dict[str, list[str]] = {"migrated": [], "orphaned": []}
        if not os.path.isdir(d):
            return out
        root = os.path.join(self.base_path, table)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".json") or fn.endswith(".tmp"):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if m.get("data_path") or m.get("partition") is None:
                continue
            legacy_rel = f"date={m['partition']}"
            if os.path.isdir(os.path.join(root, legacy_rel)):
                m["data_path"] = legacy_rel
                self._write_manifest(table, str(m["partition"]), m)
                out["migrated"].append(str(m["partition"]))
            else:
                out["orphaned"].append(str(m["partition"]))
        return out

    def current_snapshot_id(self, table: str) -> int | None:
        p = os.path.join(self._snapshots_dir(table), "CURRENT")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def read_snapshot(self, table: str, snapshot_id: int) -> dict | None:
        p = os.path.join(self._snapshots_dir(table), f"v{snapshot_id}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _publish_snapshot(self, table: str, attempts: int = 5) -> int:
        """Compose a snapshot from the manifest scan and swap CURRENT to it
        atomically; re-check after the swap so concurrent disjoint-partition
        commits converge (see module docstring)."""
        d = self._snapshots_dir(table)
        os.makedirs(d, exist_ok=True)
        # distinguishes a converged publish (CURRENT verified == manifest
        # scan) from a gave-up-under-contention one; commit() surfaces it as
        # metrics['snapshot_converged'] so callers never mistake a racing
        # writer's id for their own certified state
        self.last_publish_converged = False
        last_id = self.current_snapshot_id(table) or 0
        for _ in range(attempts):
            parts = self._scan_manifest_parts(table)
            cur_id = self.current_snapshot_id(table)
            if cur_id is not None:
                cur = self.read_snapshot(table, cur_id)
                if cur is not None and cur.get("parts") == parts:
                    self.last_publish_converged = True
                    return cur_id
                last_id = cur_id
            nid = last_id + 1
            while True:  # unique id under concurrency: O_EXCL create
                path = os.path.join(d, f"v{nid}.json")
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    break
                except FileExistsError:
                    nid += 1
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {"id": nid, "ts": time.time(), "parts": parts},
                    f, sort_keys=True,
                )
            tmp = os.path.join(d, f"CURRENT.tmp.{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as f:
                f.write(str(nid))
            os.replace(tmp, os.path.join(d, "CURRENT"))
            last_id = nid
        return last_id

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
        publish: bool = True,
    ) -> CommitResult:
        """Write only partitions whose input fingerprint changed.

        ``publish=False`` performs ONLY the data write: manifests and the
        snapshot/CURRENT swap are staged on the returned result and applied
        by :meth:`finalize_commit`. Because data files live under a fresh
        commit-id directory that nothing references until the manifests
        land, an abort between the halves is invisible to readers (CURRENT
        still points at the previous snapshot) and to reruns (staleness is
        re-derived from the OLD manifests) — the mechanism that lets a
        caller run a data-quality invariant AFTER the heavy write but
        BEFORE anything becomes visible."""
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
        staged_manifests: list[tuple[str, dict]] = []
        for part, fp in sorted(fps.items()):
            m = self.read_manifest(table, str(part))
            if m and m.get("fingerprint") == fp and m.get("schema_version") == SCHEMA_VERSION:
                result.skipped.append(str(part))
            else:
                stale.append(part)

        if stale:
            out = df.filter(F.col(part_col).isin([p for p in stale]))
            # immutable data files: every commit writes under a fresh
            # commit-id directory so files referenced by existing snapshots
            # are never touched — the write needs no overwrite mode at all
            cid = uuid.uuid4().hex[:12]
            data_rel = os.path.join("data", cid)
            # repartition by (partition value, bounded content-hash split):
            # pure repartition(part_col) would funnel EVERY row of a date
            # through ONE writer task — a serialization point at any scale
            # (a 3-day corpus writes on 3 cores of a 1000-core cluster) —
            # while a raw write would emit (tasks × partitions) small
            # files. The sub-split width is derived from the EXACT row
            # counts the fingerprint pass already computed: the busiest
            # stale partition gets ceil(rows / target_rows_per_file)
            # writer tasks, capped at the session's parallelism — so a
            # 10B-row date still spreads over every writer core while a
            # cascade tier's few-thousand-row date writes one file
            # instead of parallelism-many tiny ones. The key hashes a
            # stable atomic column so the layout is deterministic for a
            # deterministic input.
            par = df.sparkSession.sparkContext.defaultParallelism
            # split width PER stale partition, from its exact row count:
            # a global max-based width would shatter a small date committed
            # alongside a big one into max-width tiny files (the round-6
            # small-tier tax, reappearing WITHIN a mixed-size commit).
            # Width = max(size-derived, balance-derived): size wants
            # ceil(rows/target) files of ~target rows; balance wants a
            # partition with enough rows to keep the writer cores busy
            # (rows // MIN_ROWS_PER_FILE writers, never making files
            # below the parquet floor). A pure size rule serialized each
            # date onto ONE writer below target rows — measured on the
            # 1->4-executor scaling pair as a multi-second 4-exec-only
            # tax with zero 1-exec effect.
            k_by_part = {
                str(p): max(
                    1,
                    min(par, -(-int(fps[p]["rows"]) // self.target_rows_per_file)),
                    min(par, int(fps[p]["rows"]) // self.MIN_ROWS_PER_FILE),
                )
                for p in stale
            }
            atomic = [
                f.name for f in out.schema.fields
                if f.name != part_col
                and f.dataType.typeName()
                in ("long", "integer", "string", "double", "timestamp")
            ]
            pref = [c for c in ("skey", "sig", "bucket_ts", "block_ts") if c in atomic]
            split_col = (pref or atomic or [None])[0]
            if split_col is not None and max(k_by_part.values()) > 1:
                kmap = F.create_map(
                    *[x for p, k in sorted(k_by_part.items())
                      for x in (F.lit(p), F.lit(k))]
                )
                split = F.coalesce(
                    F.pmod(
                        F.xxhash64(F.col(split_col)),
                        F.element_at(kmap, F.col(part_col).cast("string")),
                    ),
                    F.lit(0),
                )
            else:
                split = F.lit(0)
            # explicit numPartitions: AQE coalesces column-only
            # repartitions back down (small-in-bytes tier outputs
            # collapse to ~1 writer task); an explicit count pins the
            # write tasks regardless of byte-size heuristics. Hash
            # collisions between (date, split) groups can only MERGE
            # writer tasks (fewer files), never fragment; padding the
            # task count to the session parallelism keeps collision odds
            # low while empty partitions write no files at all.
            total_k = max(sum(k_by_part.values()), par)
            (
                out.repartition(total_k, F.col(part_col), split)
                .write.mode("error")
                .partitionBy(part_col)
                .parquet(os.path.join(result.table_path, data_rel))
            )

            for part in stale:
                entry = {
                    "partition": str(part),
                    "fingerprint": fps[part],
                    "schema_version": SCHEMA_VERSION,
                    "data_path": os.path.join(
                        data_rel, f"{part_col}={part}"
                    ),
                    "written_at": time.time(),
                    "metrics": stage_metrics or {},
                }
                staged_manifests.append((str(part), entry))
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
        snap_entry = {
            "ts": time.time(),
            "written": result.written,
            "skipped": result.skipped,
            "metrics": result.metrics,
        }
        if not publish:
            result.pending = {
                "table": table,
                "manifests": staged_manifests,
                "snapshot": snap_entry,
            }
            return result
        for part, entry in staged_manifests:
            self._write_manifest(table, part, entry)
        self._append_snapshot(table, snap_entry)
        result.metrics["snapshot_id"] = self._publish_snapshot(table)
        result.metrics["snapshot_converged"] = bool(
            getattr(self, "last_publish_converged", True)
        )
        return result

    def finalize_commit(self, result: CommitResult) -> CommitResult:
        """Second half of a ``publish=False`` commit: write the staged
        manifests, append the snapshot-log entry and swap CURRENT. Until
        this runs, nothing the first half wrote is visible to readers or
        to a rerun's staleness scan."""
        if result.pending is None:
            return result  # already published (publish=True commit)
        table = result.pending["table"]
        for part, entry in result.pending["manifests"]:
            self._write_manifest(table, part, entry)
        self._append_snapshot(table, result.pending["snapshot"])
        result.metrics["snapshot_id"] = self._publish_snapshot(table)
        result.metrics["snapshot_converged"] = bool(
            getattr(self, "last_publish_converged", True)
        )
        result.pending = None
        return result

    # -- retention ------------------------------------------------------------

    def apply_retention(self, table: str, cutoff_date: str) -> dict:
        """Logically EXPIRE partitions older than the cutoff (``part <
        cutoff_date`` — ISO dates order lexicographically) and publish a
        snapshot without them: the retention half of the north rule's
        '1m/1h/1d retention tiers', applied per tier with its own horizon
        (e.g. raw+1m kept days, 1h kept months, 1d kept forever).

        Expiry is a SNAPSHOT operation, not a delete: the expired
        partitions' manifests move to ``_lineage/_expired/`` (so the pure
        manifest scan no longer sees them) and data files stay on disk —
        every retained snapshot id still time-travels to the full table
        until :meth:`vacuum` reclaims unreferenced dirs. The action is
        recorded in the snapshot log."""
        parts = self._scan_manifest_parts(table)
        expired = sorted(p for p in parts if p < cutoff_date)
        exp_dir = os.path.join(self._lineage_dir(table), "_expired")
        if expired:
            os.makedirs(exp_dir, exist_ok=True)
            for p in expired:
                os.replace(
                    self._manifest_path(table, p),
                    os.path.join(exp_dir, f"{p}.json"),
                )
        sid = self._publish_snapshot(table)
        self._append_snapshot(
            table,
            {"action": "retention", "cutoff": cutoff_date,
             "expired": expired, "snapshot": sid, "ts": time.time()},
        )
        return {"expired": expired, "snapshot": sid}

    def vacuum(self, table: str, retain_snapshots: int = 2) -> dict:
        """Physically reclaim data dirs referenced by NO retained snapshot
        and drop snapshot manifests beyond the horizon, so time travel past
        it fails loudly (FileNotFoundError) instead of reading half-deleted
        data. Retained = the newest ``retain_snapshots`` snapshot ids (the
        CURRENT pointer is always among them) plus everything the live
        partition manifests reference (an unpublished staged commit is
        never reclaimed)."""
        root = os.path.join(self.base_path, table)
        d = self._snapshots_dir(table)
        ids = sorted(
            int(fn[1:-5])
            for fn in (os.listdir(d) if os.path.isdir(d) else [])
            if fn.startswith("v") and fn.endswith(".json")
        )
        keep = set(ids[-max(int(retain_snapshots), 1):])
        cur = self.current_snapshot_id(table)
        if cur is not None:
            keep.add(cur)
        referenced = set(self._scan_manifest_parts(table).values())
        for sid in keep:
            snap = self.read_snapshot(table, sid)
            if snap is not None:
                referenced.update(snap["parts"].values())
        # candidate data dirs: snapshot-era data/<cid>/date=* plus legacy
        # root-level date=*
        candidates = [
            os.path.relpath(p, root)
            for p in glob.glob(os.path.join(root, "data", "*", "date=*"))
            + glob.glob(os.path.join(root, "date=*"))
        ]
        removed = sorted(rel for rel in candidates if rel not in referenced)
        for rel in removed:
            shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
        for cid_dir in glob.glob(os.path.join(root, "data", "*")):
            if os.path.isdir(cid_dir) and not os.listdir(cid_dir):
                os.rmdir(cid_dir)
        dropped = sorted(set(ids) - keep)
        for sid in dropped:
            try:
                os.remove(os.path.join(d, f"v{sid}.json"))
            except OSError:
                pass
        return {"removed_dirs": removed, "dropped_snapshots": dropped}

    def compact(self, spark, table: str, slack_files: int = 0) -> dict:
        """Small-file compaction — the ``rewrite_data_files`` maintenance
        action of an Iceberg table, expressed on the manifest store: every
        live partition whose parquet file count exceeds its row-derived
        writer width (``ceil(rows / target_rows_per_file)``, capped at the
        session parallelism) by more than ``slack_files`` is rewritten into
        a fresh immutable ``data/<cid>/`` directory at the correct width,
        and a new snapshot is published.

        Data is bit-unchanged: the partition manifests keep their input
        FINGERPRINTS (compaction rewrites layout, not rows), so the next
        incremental commit still skips these partitions. Old files stay on
        disk — every retained snapshot id still time-travels to the
        pre-compaction layout until :meth:`vacuum` reclaims them. At 100 TB
        this is the periodic maintenance job that keeps scan task counts
        proportional to data size after a history of mixed-width commits
        or a retuned ``target_rows_per_file``."""
        from ..engine.runner import configure_session

        configure_session(spark)
        root = os.path.join(self.base_path, table)
        parts = self._scan_manifest_parts(table)
        par = spark.sparkContext.defaultParallelism
        frag: dict[str, tuple[str, int]] = {}  # part -> (rel dir, want width)
        for part, rel in sorted(parts.items()):
            m = self.read_manifest(table, part) or {}
            rows = int((m.get("fingerprint") or {}).get("rows", 0))
            want = max(1, min(par, -(-rows // self.target_rows_per_file)))
            have = len(glob.glob(os.path.join(root, rel, "*.parquet")))
            if have > want + int(slack_files):
                frag[part] = (rel, want)
        if not frag:
            return {"rewritten": [], "snapshot": self.current_snapshot_id(table)}

        cid = uuid.uuid4().hex[:12]
        data_rel = os.path.join("data", cid)
        for part, (rel, want) in frag.items():
            df = spark.read.parquet(os.path.join(root, rel))
            split_col = next(
                (c for c in ("skey", "sig", "bucket_ts", "block_ts") if c in df.columns),
                df.columns[0] if df.columns else None,
            )
            split = (
                F.pmod(F.xxhash64(F.col(split_col)), F.lit(want))
                if split_col is not None and want > 1
                else F.lit(0)
            )
            (
                df.repartition(want, split)
                .write.mode("error")
                .parquet(os.path.join(root, data_rel, f"date={part}"))
            )
            m = self.read_manifest(table, part) or {"partition": part}
            m["data_path"] = os.path.join(data_rel, f"date={part}")
            m["compacted_at"] = time.time()
            self._write_manifest(table, part, m)
        sid = self._publish_snapshot(table)
        self._append_snapshot(
            table,
            {"action": "compact", "rewritten": sorted(frag),
             "snapshot": sid, "ts": time.time()},
        )
        return {"rewritten": sorted(frag), "snapshot": sid}

    def read(self, spark, table: str, snapshot_id: int | None = None) -> DataFrame:
        """Read the table at CURRENT (default) or at a retained snapshot id
        (time travel). Resolution is one pointer read + one manifest load —
        a reader racing a writer sees the previous complete snapshot until
        the writer's atomic CURRENT swap."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id(table)
        if sid is None:
            # pre-snapshot table (or bare parquet dir): raw read
            return spark.read.parquet(os.path.join(self.base_path, table))
        snap = self.read_snapshot(table, sid)
        if snap is None:
            raise FileNotFoundError(
                f"snapshot v{sid} of table {table!r} does not exist"
            )
        root = os.path.join(self.base_path, table)
        by_cid: dict[str, list[str]] = {}
        for rel in snap["parts"].values():
            by_cid.setdefault(os.path.dirname(rel), []).append(
                os.path.join(root, rel)
            )
        dfs = [
            spark.read.option("basePath", os.path.join(root, cid_dir))
            .parquet(*sorted(paths))
            for cid_dir, paths in sorted(by_cid.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


def with_date(df: DataFrame, ts_col: str = "bucket_ts") -> DataFrame:
    return df.withColumn(
        "date", F.date_format(F.timestamp_millis(F.col(ts_col)), "yyyy-MM-dd")
    )
