"""Versioned parquet tables with time travel — the Delta/Iceberg
snapshot pattern on plain parquet, matching the repo's sink-agnostic
merge discipline (operators/merge.py): every write lands in a fresh
``v=N`` directory, a tiny JSON manifest names the current version, and
readers pin any historical version by number.

What is (and is not) guaranteed: writes are crash-safe (data staged to
a temp dir, renamed into place, manifest swapped last with
``os.replace`` — a crash leaves the previous version current); reads
are snapshot-isolated from concurrent writers ON ONE WRITER.  True
multi-writer atomicity needs a log with compare-and-swap (Delta's
_delta_log) — environment-blocked here and documented, not emulated
badly.  At 100 TB each version is just a directory of parquet (old
versions are pruned with ``expire_versions``, the retention twin of
sinks.expire_partitions).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_versions.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST)


def _load_manifest(table_path: str) -> dict:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return {"current": 0, "versions": []}
    with open(p) as f:
        return json.load(f)


def versions(table_path: str) -> list[dict]:
    """Version history, oldest first: [{"v": N, "n_rows": X}, ...]."""
    return list(_load_manifest(table_path)["versions"])


def write_versioned(df: DataFrame, table_path: str) -> int:
    """Commit `df` as the next version of the table; returns the new
    version number.  Stage -> rename -> manifest-swap, in that order:
    a crash at any point leaves the previous version current and at
    worst an orphaned temp/uncommitted dir (never a half-visible
    version)."""
    os.makedirs(table_path, exist_ok=True)
    man = _load_manifest(table_path)
    v = man["current"] + 1
    tmp = os.path.join(table_path, f"__stage_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp)
    n_rows = df.sparkSession.read.parquet(tmp).count()
    final = os.path.join(table_path, f"v={v}")
    os.rename(tmp, final)
    man["versions"].append({"v": v, "n_rows": n_rows})
    man["current"] = v
    mtmp = _manifest_path(table_path) + f".tmp.{uuid.uuid4().hex}"
    with open(mtmp, "w") as f:
        json.dump(man, f)
    os.replace(mtmp, _manifest_path(table_path))
    return v


def read_versioned(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the current version, or pin `version` for time travel."""
    man = _load_manifest(table_path)
    if man["current"] == 0:
        raise FileNotFoundError(f"no committed versions at {table_path}")
    v = man["current"] if version is None else version
    known = {e["v"] for e in man["versions"]}
    if v not in known:
        raise ValueError(
            f"version {v} not in table history {sorted(known)}"
        )
    return spark.read.parquet(os.path.join(table_path, f"v={v}"))


def expire_versions(table_path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` versions (directory-level,
    metadata-only — O(versions) regardless of data size).  The current
    version is always kept.  Returns the dropped version numbers."""
    man = _load_manifest(table_path)
    history = sorted(man["versions"], key=lambda e: e["v"])
    to_drop = history[:-keep_last] if keep_last > 0 else history[:-1]
    dropped = []
    for e in to_drop:
        if e["v"] == man["current"]:
            continue
        shutil.rmtree(
            os.path.join(table_path, f"v={e['v']}"), ignore_errors=True
        )
        dropped.append(e["v"])
    man["versions"] = [e for e in man["versions"] if e["v"] not in dropped]
    mtmp = _manifest_path(table_path) + f".tmp.{uuid.uuid4().hex}"
    with open(mtmp, "w") as f:
        json.dump(man, f)
    os.replace(mtmp, _manifest_path(table_path))
    return dropped
