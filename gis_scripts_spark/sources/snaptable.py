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
- `partition_by` + `stats_cols` record an Iceberg-MANIFEST-style file list
  in the snapshot (per data file: partition values parsed from the Hive
  layout + min/max per stats column, gathered by ONE bounded agg job that
  replaces the row-count job); `read_snapshot(where=...)` then prunes
  files DRIVER-SIDE from the manifest before Spark ever lists them — the
  scan-planning half of Iceberg, which at 10^12 rows is the difference
  between opening 12 files and opening 80,000 (parquet row-group pruning
  only helps after the file is opened; manifest pruning avoids the open,
  and on an object store the LIST + per-file GET round-trips).
  `partition_by("cell_prefix")` is the north rule's "explicit
  repartitioning by cell prefix" persisted into the table layout.

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


def _parse_partition_values(rel_path: str) -> dict:
    """Hive-layout partition values from a file path relative to the
    snapshot dir: 'cell_prefix=5/part-...parquet' -> {'cell_prefix': '5'}.
    Values are kept as the layout's STRINGS (the same convention Hive /
    Spark use on disk); pruning compares str(needle) == recorded."""
    vals = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            vals[k] = v
    return vals


def write_snapshot(
    df: DataFrame,
    table: str,
    stage: str | None = None,
    mode: str = "append",
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> dict:
    """Commit df as a new snapshot of `table`. mode: 'append' keeps prior
    snapshots readable and the new one current; 'overwrite' makes the new
    snapshot the sole logical content (old files stay for time travel).

    `partition_by` lays the snapshot out Hive-style (e.g. by cell prefix);
    `stats_cols` additionally records per-FILE min/max for those columns in
    the manifest (Iceberg-manifest semantics) so `read_snapshot(where=...)`
    can prune files without listing them. Both are gathered by ONE agg job
    over the just-written files — it replaces the plain row-count job, so
    stats cost no extra pass.

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
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    from pyspark.sql import functions as F

    back = df.sparkSession.read.parquet(data_dir)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols or []:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    # one row per data FILE — manifest-entry scale (bounded by the file
    # count the write itself produced), not data scale
    per_file = (
        back.groupBy(F.input_file_name().alias("_f")).agg(*aggs).collect()
    )
    files = []
    n_rows = 0
    marker = os.path.basename(data_dir) + "/"
    for r in sorted(per_file, key=lambda r: r["_f"]):
        # input_file_name is a URI ("file:///..."); keep the path relative
        # to the snapshot dir (portable across table relocation)
        rel = r["_f"].split(marker, 1)[-1]
        n_rows += int(r["_rows"])
        entry = {
            "path": rel,
            "rows": int(r["_rows"]),
            "partition": _parse_partition_values(rel),
        }
        if stats_cols:
            entry["stats"] = {
                c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in stats_cols
            }
        files.append(entry)
    parents = [manifest["current"]] if (mode == "append" and manifest["current"]) else []
    record = {
        "id": snap_id,
        "parents": parents,
        "stage": stage,
        "mode": mode,
        "path": data_dir,
        "rows": int(n_rows),
        "partition_by": partition_by or [],
        "files": files,
        "committed_at": time.time(),
        "write_seconds": round(time.time() - t0, 3),
    }
    manifest["snapshots"].append(record)
    manifest["current"] = snap_id
    _commit_manifest(table, manifest)
    return record


def _file_may_match(entry: dict, col: str, lo, hi) -> bool:
    """Conservative manifest pruning: keep the file unless its recorded
    metadata PROVES no row can satisfy lo <= col <= hi."""
    pv = entry.get("partition", {})
    if col in pv:
        raw = pv[col]
        # Hive layout stores strings; exact INTEGER compare when both sides
        # are integral — packed cell ids exceed 2^53, where float compare
        # would merge adjacent ids and weaken pruning
        try:
            v = int(raw)
            lo_i, hi_i = int(lo), int(hi)
            if lo_i == lo and hi_i == hi:
                return lo_i <= v <= hi_i
        except (TypeError, ValueError):
            pass
        try:
            return float(lo) <= float(raw) <= float(hi)
        except (TypeError, ValueError):
            return str(lo) <= raw <= str(hi)
    st = entry.get("stats", {}).get(col)
    if st is None or st[0] is None or st[1] is None:
        return True  # no metadata for this column -> cannot prune
    return not (st[1] < lo or st[0] > hi)


def read_snapshot(
    spark: SparkSession,
    table: str,
    snapshot_id: str | None = None,
    where: dict | None = None,
) -> DataFrame:
    """Read the table at a snapshot (default: current). 'append' lineage is
    the union of the snapshot chain; 'overwrite' truncates the chain.

    `where` = {col: value} or {col: (lo, hi)} prunes data files from the
    MANIFEST (Iceberg scan planning: partition values + per-file min/max
    recorded at write time) before Spark lists anything, then applies the
    same predicate as a real filter — semantics are exactly
    `read_snapshot(...).filter(...)`, only the file listing shrinks.
    Columns without recorded metadata simply don't prune."""
    manifest = _load_manifest(table)
    by_id = {s["id"]: s for s in manifest["snapshots"]}
    sid = snapshot_id or manifest["current"]
    if sid is None:
        raise FileNotFoundError(f"no snapshots in {table}")
    chain = []
    while sid is not None:
        s = by_id[sid]
        chain.append(s)
        sid = s["parents"][0] if (s["mode"] == "append" and s["parents"]) else None

    norm = {
        c: (v if isinstance(v, (tuple, list)) else (v, v))
        for c, v in (where or {}).items()
    }
    parts = []
    for s in chain:
        files = s.get("files")
        if norm and files is not None:
            keep = [
                f for f in files
                if all(_file_may_match(f, c, lo, hi) for c, (lo, hi) in norm.items())
            ]
            if not keep:
                continue
            if len(keep) < len(files):
                # basePath restores partition columns when reading leaf files
                parts.append(
                    spark.read.option("basePath", s["path"]).parquet(
                        *[os.path.join(s["path"], f["path"]) for f in keep]
                    )
                )
                continue
        parts.append(spark.read.parquet(s["path"]))

    if not parts:
        # every file proven non-matching: an empty frame with the table's
        # schema (read the snapshot dir, filter can't match)
        parts = [spark.read.parquet(chain[0]["path"])]

    from functools import reduce

    from pyspark.sql import functions as F

    df = reduce(lambda a, b: a.unionByName(b), parts)
    for c, (lo, hi) in norm.items():
        df = df.filter((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return df
