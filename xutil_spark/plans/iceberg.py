"""Iceberg table-format adapter for the snapshot layer.

The north rule's storage target is Iceberg; this sandbox has no
Iceberg runtime jar, so the engine ships two interchangeable backends
behind one API:

* ``plans.snapshot.SnapshotStore`` — the self-contained parquet
  implementation of the SAME mechanics Iceberg provides (atomic
  staging-rename commit ≙ Iceberg's atomic metadata swap, the linear
  manifest log ≙ snapshot log, per-partition lineage ≙ manifest file
  stats, ``find(stage, fingerprint)`` resume ≙ snapshot-id rollback).
* this module — the thin mapping onto a real Iceberg catalog when the
  runtime is on the classpath (``spark.sql.catalog.* = org.apache.
  iceberg.spark.SparkCatalog``): commits become ``writeTo().
  createOrReplace()``, resume reads ``VERSION AS OF``, lineage comes
  from the ``<table>.files`` metadata table.

Every call raises ``IcebergUnavailable`` with the config it needs when
the runtime is absent — loud, not silent fallback; callers that want
the portable behavior use SnapshotStore directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is importable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "no Iceberg runtime on the classpath — add "
            "spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-3.5_2.13 "
            "and a spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog "
            "config, or use plans.snapshot.SnapshotStore (same semantics, "
            "plain parquet)"
        )


def commit(df: DataFrame, table: str) -> None:
    """Atomic snapshot commit ≙ SnapshotStore.commit: Iceberg's
    metadata swap makes the new snapshot visible all-or-nothing."""
    _require(df.sparkSession)
    df.writeTo(table).createOrReplace()


def read_version(spark: SparkSession, table: str, snapshot_id: int) -> DataFrame:
    """Resume-from-checkpoint ≙ SnapshotStore.read(snapshot)."""
    _require(spark)
    return spark.read.option("snapshot-id", snapshot_id).table(table)


def lineage(spark: SparkSession, table: str) -> DataFrame:
    """Per-partition/file lineage ≙ SnapshotStore.metrics: Iceberg's
    ``files`` metadata table (record_count, file_size, partition)."""
    _require(spark)
    return spark.table(f"{table}.files").select(
        "file_path", "record_count", "file_size_in_bytes", "partition"
    )


def snapshots(spark: SparkSession, table: str) -> DataFrame:
    """Snapshot log ≙ SnapshotStore.snapshots()."""
    _require(spark)
    return spark.table(f"{table}.snapshots")
