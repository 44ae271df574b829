"""Manifest-based table snapshots with time travel (lakehouse versioning).

The reference's warehouse is append-only BigQuery, where every load job is
implicitly a new table version and `FOR SYSTEM_TIME AS OF` gives time travel
for free. Plain parquet directories have neither, so this module adds the
minimal transaction-log mechanism Delta/Iceberg are built on:

- a commit = (a) write new data files under ``<table>/data/c<NNNNN>/``,
  (b) atomically publish ``<table>/_manifests/v<N>.json`` listing the FULL
  set of files visible at that version (parent files + new for ``append``,
  new only for ``overwrite``);
- a read at version N = ``spark.read.parquet(*manifest[N].files)`` — the
  query plan is built from the manifest's file list, never from directory
  listing, so concurrent/failed writers can never leak half-written files
  into a read (files not in a published manifest don't exist).

Scale shape (the point of the design): planning cost is O(len(manifest)),
not O(object-store LIST) — at 100 TB with millions of files, listing is the
bottleneck manifests exist to remove. Data files are immutable; commits only
add files and swap a pointer, so time travel to any retained version is a
metadata operation. A real deployment adds file-level min/max stats to the
manifest for pruning and a catalog swap for multi-writer atomicity — that is
exactly Iceberg's snapshot + manifest-list design, emulated here one level
down.

Reference parity: the versioned-load audit trail of the reference's BigQuery
load jobs (``src/bq.js:49`` insert batches; `README.md:86-92` table DDL).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _MANIFEST_DIR, f"v{version}.json")


def list_snapshots(table_path: str) -> list[int]:
    """Published versions, ascending. Only manifests count — data files
    without a manifest are invisible (uncommitted)."""
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as f:
        return json.load(f)


def commit_snapshot(df: DataFrame, table_path: str, mode: str = "append") -> int:
    """Write ``df`` as a new snapshot of the table; returns the new version.

    ``append`` makes the new version = parent files + this commit's files;
    ``overwrite`` makes it this commit's files only (the parent's files stay
    on disk, still readable through older manifests — that immutability is
    what makes time travel and concurrent readers safe).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported snapshot mode: {mode!r}")
    # Single-writer fence (same lock as merge_upsert): without it two
    # concurrent committers can allocate the SAME version number and the
    # later manifest publish silently clobbers the earlier one.
    from drive_health_etl_spark.operators.upsert import warehouse_write_lock

    with warehouse_write_lock(table_path):
        versions = list_snapshots(table_path)
        version = (versions[-1] + 1) if versions else 1
        commit_dir = os.path.join(table_path, "data", f"c{version:05d}")
        df.write.mode("error").parquet(commit_dir)
        files = sorted(
            os.path.join(commit_dir, name)
            for name in os.listdir(commit_dir)
            if name.endswith(".parquet")
        )
        if mode == "append" and versions:
            files = _read_manifest(table_path, versions[-1])["files"] + files
        os.makedirs(os.path.join(table_path, _MANIFEST_DIR), exist_ok=True)
        # Publish atomically: manifest becomes visible all-or-nothing
        # (rename on one filesystem), mirroring the spool sink's
        # rename-as-commit protocol.
        tmp = _manifest_path(table_path, version) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": version,
                    "mode": mode,
                    "parent": versions[-1] if versions else None,
                    "files": files,
                },
                f,
            )
        os.replace(tmp, _manifest_path(table_path, version))
    return version


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (latest when omitted) — plans from
    the manifest's explicit file list, never a directory listing."""
    versions = list_snapshots(table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshots published at {table_path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"version {version} not in {versions}")
    files = _read_manifest(table_path, version)["files"]
    return spark.read.parquet(*files)


# --- registered query -------------------------------------------------------


def lake_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: commit the events table as v1, commit a correction batch
    (every `error` event re-tagged) as v2-overwrite, then read AS OF v1 —
    which must be byte-identical to the original table even though v2 is
    current. The oracle is the plain events table: time travel returning
    anything else is a correctness bug, not a freshness difference."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from drive_health_etl_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    table = tempfile.mkdtemp(prefix="dhe_lake_")
    shutil.rmtree(table, ignore_errors=True)
    try:
        v1 = commit_snapshot(events, table, mode="append")
        corrected = events.withColumn(
            "event_type",
            F.when(F.col("event_type") == "error", F.lit("error_reviewed")).otherwise(
                F.col("event_type")
            ),
        )
        commit_snapshot(corrected, table, mode="overwrite")
        asof_v1 = read_snapshot(spark, table, version=v1).select(
            "event_id", "user_id", "ts", "event_type", "value"
        )
        # The read is lazy; pin the data in the block manager so the temp
        # table directory can be removed before the caller collects.
        return asof_v1.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(table, ignore_errors=True)


LAKE_TIME_TRAVEL_SQL = """
SELECT event_id, user_id, ts, event_type, value FROM events
"""


QUERIES: dict[str, tuple] = {
    "lake_time_travel": (lake_time_travel, LAKE_TIME_TRAVEL_SQL),
}
