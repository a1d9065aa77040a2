"""Snapshot-versioned parquet tables — Iceberg-semantics checkpoint/restart.

The sandbox has no Iceberg runtime jars, so the engine implements the same
CONTRACT on plain parquet (the code is catalog-agnostic: on a cluster with
Iceberg you'd swap `write_snapshot` for `df.writeTo(tbl).append()` and
`read_snapshot` for time-travel reads — the call sites don't change):

- every committed write is an immutable SNAPSHOT: data lands in
  `<table>/snap-<id>/` and becomes visible only when the manifest JSON is
  atomically renamed into place (write-temp + os.replace, the same
  atomic-commit trick Iceberg/Hive use)
- the manifest records snapshot id, parent id, stage key, row count and
  wall time -> lineage chain
- `stage key` gives IDEMPOTENT RESTART: a pipeline re-run skips stages
  whose key is already committed (replaces the reference's
  skip-if-file-exists patterns, ``download_usgs_lidar.py:29-36``,
  ``global_match.py:237``)

This is the north rule's "resumable from checkpoint via snapshot IDs".
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


def _manifest_path(table: str) -> str:
    return os.path.join(table, _MANIFEST)


def _load_manifest(table: str) -> dict:
    p = _manifest_path(table)
    if not os.path.exists(p):
        return {"snapshots": [], "current": None}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(table: str, manifest: dict) -> None:
    tmp = os.path.join(table, f"._manifest.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(table))  # atomic commit point


def snapshots(table: str) -> list[dict]:
    return _load_manifest(table)["snapshots"]


def current_snapshot(table: str) -> dict | None:
    m = _load_manifest(table)
    for s in m["snapshots"]:
        if s["id"] == m["current"]:
            return s
    return None


def completed_stages(table: str) -> set[str]:
    return {s["stage"] for s in snapshots(table) if s.get("stage")}


def write_snapshot(
    df: DataFrame,
    table: str,
    stage: str | None = None,
    mode: str = "append",
) -> dict:
    """Commit df as a new snapshot of `table`. mode: 'append' keeps prior
    snapshots readable and the new one current; 'overwrite' makes the new
    snapshot the sole logical content (old files stay for time travel).

    Returns the snapshot record. If `stage` is given and already committed,
    this is a NO-OP returning the existing record (idempotent restart)."""
    os.makedirs(table, exist_ok=True)
    manifest = _load_manifest(table)
    if stage is not None:
        for s in manifest["snapshots"]:
            if s.get("stage") == stage:
                return s  # stage already checkpointed — resume skips it

    snap_id = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(table, f"snap-{snap_id}")
    t0 = time.time()
    df.write.mode("errorifexists").parquet(data_dir)
    n_rows = df.sparkSession.read.parquet(data_dir).count()
    parents = [manifest["current"]] if (mode == "append" and manifest["current"]) else []
    record = {
        "id": snap_id,
        "parents": parents,
        "stage": stage,
        "mode": mode,
        "path": data_dir,
        "rows": int(n_rows),
        "committed_at": time.time(),
        "write_seconds": round(time.time() - t0, 3),
    }
    manifest["snapshots"].append(record)
    manifest["current"] = snap_id
    _commit_manifest(table, manifest)
    return record


def read_snapshot(spark: SparkSession, table: str, snapshot_id: str | None = None) -> DataFrame:
    """Read the table at a snapshot (default: current). 'append' lineage is
    the union of the snapshot chain; 'overwrite' truncates the chain."""
    manifest = _load_manifest(table)
    by_id = {s["id"]: s for s in manifest["snapshots"]}
    sid = snapshot_id or manifest["current"]
    if sid is None:
        raise FileNotFoundError(f"no snapshots in {table}")
    paths = []
    while sid is not None:
        s = by_id[sid]
        paths.append(s["path"])
        sid = s["parents"][0] if (s["mode"] == "append" and s["parents"]) else None
    return spark.read.parquet(*paths)
