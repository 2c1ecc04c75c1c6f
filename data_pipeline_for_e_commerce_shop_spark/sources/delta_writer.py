"""Delta Lake TABLE WRITER over the open _delta_log protocol — the
reverse of :mod:`delta_reader`, so the medallion zones this engine
writes are readable by STOCK Delta readers (delta-spark, delta-rs,
DuckDB's delta extension) and a user arriving with Delta tables (the
reference's validated zone, scripts/validation.py:121-129) can keep
appending to them in-protocol.

What a commit is (PROTOCOL.md): stage parquet data files into the
table directory under unique names, then atomically publish
``_delta_log/<20-digit version>.json`` containing the protocol /
metaData actions (first commit only) and one ``add`` action per staged
file (plus ``remove`` actions for an overwrite).  The atomic-publish
CAS is the same os.link discipline as sources/versioned.py — two
racing writers cannot both claim a version, the loser retries with a
fresh read of the log (blind append) or raises (read-modify-write).

Checkpoints: every ``checkpoint_interval`` commits the writer emits a
classic single-file checkpoint ``<v>.checkpoint.parquet`` — one row
per live action with the canonical five top-level structs (txn, add,
remove, metaData, protocol) — and updates ``_last_checkpoint``.  That
is exactly the artifact delta_reader's checkpoint path consumes, and
it lets stock readers drop the early JSON.

Scale: the log fold and checkpoint write are driver-side metadata work
(KBs per commit; checkpoint rows = live-file count), identical in
shape to Delta's own snapshot/checkpoint writer.  Data files are
written by the ordinary distributed parquet writer.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame

from data_pipeline_for_e_commerce_shop_spark.sources.versioned import (
    ConcurrentWriteError,
)
from data_pipeline_for_e_commerce_shop_spark.sources.delta_reader import (
    _resolve_files,
    delta_log_versions,
)

_MAX_COMMIT_ATTEMPTS = 20
DEFAULT_CHECKPOINT_INTERVAL = 10


def _stage_data_files(df: DataFrame, table_path: str) -> list[dict]:
    """Write df's partitions as parquet files directly under the table
    root with Delta-style unique names; returns add-action dicts
    (path, size, modificationTime, dataChange)."""
    tmp = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp)
    adds = []
    for part in sorted(glob.glob(os.path.join(tmp, "part-*.parquet"))):
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        dest = os.path.join(table_path, name)
        shutil.move(part, dest)
        adds.append(
            {
                "path": name,
                "partitionValues": {},
                "size": os.path.getsize(dest),
                "modificationTime": int(time.time() * 1000),
                "dataChange": True,
            }
        )
    shutil.rmtree(tmp, ignore_errors=True)
    return adds


def _metadata_action(df: DataFrame) -> dict:
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }
    }


def write_delta_commit(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    checkpoint_interval: int = DEFAULT_CHECKPOINT_INTERVAL,
    txn: tuple[str, int] | None = None,
) -> int:
    """Commit ``df`` to a Delta table (creating it if absent); returns
    the committed version.  ``mode``: 'append' adds files; 'overwrite'
    also removes every previously-live file.  Emits a classic
    checkpoint whenever (version + 1) % checkpoint_interval == 0.

    ``txn=(app_id, version)`` emits a SetTransaction action
    (PROTOCOL.md) recording that this application has committed up to
    ``version`` — the exactly-once handshake streaming sinks use: a
    retried micro-batch consults :func:`delta_reader.last_txn_versions`
    and skips itself if its version was already recorded."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(os.path.join(table_path, "_delta_log"), exist_ok=True)
    adds = _stage_data_files(df, table_path)
    log = os.path.join(table_path, "_delta_log")

    for _ in range(_MAX_COMMIT_ATTEMPTS):
        versions = delta_log_versions(table_path)
        try:
            live_before, _ = _resolve_files(table_path, None)
        except FileNotFoundError:
            live_before = []
        v = (versions[-1] + 1) if versions else 0
        actions: list[dict] = []
        if txn is not None:
            actions.append(
                {"txn": {"appId": txn[0], "version": int(txn[1])}}
            )
        if v == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(_metadata_action(df))
        if mode == "overwrite":
            ts = int(time.time() * 1000)
            for fp in live_before:
                actions.append(
                    {
                        "remove": {
                            "path": os.path.relpath(fp, table_path),
                            "deletionTimestamp": ts,
                            "dataChange": True,
                        }
                    }
                )
        actions.extend({"add": a} for a in adds)
        actions.append(
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode.upper()},
                }
            }
        )
        tmp = os.path.join(log, f".tmp_{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        final = os.path.join(log, f"{v:020d}.json")
        try:
            os.link(tmp, final)  # atomic commit point
        except FileExistsError:
            continue  # lost the race; re-read the log and retry
        finally:
            os.unlink(tmp)
        if checkpoint_interval and (v + 1) % checkpoint_interval == 0:
            _write_checkpoint(table_path, v)
        return v
    raise ConcurrentWriteError(
        f"{table_path}: gave up after {_MAX_COMMIT_ATTEMPTS} Delta"
        " commit attempts (pathological writer contention)"
    )


def _write_checkpoint(table_path: str, version: int) -> None:
    """Classic single-file checkpoint at ``version``: one row per live
    add action plus the protocol and metaData rows, in the canonical
    five-struct schema; then point _last_checkpoint at it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = os.path.join(table_path, "_delta_log")
    live, _ = _resolve_files(table_path, version)
    # latest metaData + protocol + per-app txn watermarks from the
    # JSON commits (txn rows MUST survive into the checkpoint or a
    # vacuum would reset the streaming exactly-once state)
    meta = proto = None
    txns: dict[str, int] = {}
    for v in delta_log_versions(table_path):
        if v > version:
            break
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
                elif "txn" in action:
                    t = action["txn"]
                    txns[t["appId"]] = max(
                        txns.get(t["appId"], -1), int(t["version"])
                    )

    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    txn_t = pa.struct(
        [("appId", pa.string()), ("version", pa.int64())]
    )

    rows_add: list = []
    rows_meta: list = []
    rows_proto: list = []
    rows_txn: list = []
    if proto is not None:
        rows_add.append(None)
        rows_meta.append(None)
        rows_txn.append(None)
        rows_proto.append(
            {
                "minReaderVersion": proto.get("minReaderVersion", 1),
                "minWriterVersion": proto.get("minWriterVersion", 2),
            }
        )
    if meta is not None:
        rows_add.append(None)
        rows_meta.append(
            {
                "id": meta.get("id"),
                "format": {"provider": "parquet"},
                "schemaString": meta.get("schemaString"),
                "partitionColumns": meta.get("partitionColumns", []),
                "createdTime": meta.get("createdTime"),
            }
        )
        rows_proto.append(None)
        rows_txn.append(None)
    for app_id, tv in sorted(txns.items()):
        rows_add.append(None)
        rows_meta.append(None)
        rows_proto.append(None)
        rows_txn.append({"appId": app_id, "version": tv})
    for fp in live:
        rel = os.path.relpath(fp, table_path)
        rows_add.append(
            {
                "path": rel,
                "partitionValues": [],
                "size": os.path.getsize(fp),
                "modificationTime": int(os.path.getmtime(fp) * 1000),
                "dataChange": False,
            }
        )
        rows_meta.append(None)
        rows_proto.append(None)
        rows_txn.append(None)
    n = len(rows_add)
    table = pa.table(
        {
            "txn": pa.array(rows_txn, type=txn_t),
            "add": pa.array(rows_add, type=add_t),
            "remove": pa.array([None] * n, type=remove_t),
            "metaData": pa.array(rows_meta, type=meta_t),
            "protocol": pa.array(rows_proto, type=proto_t),
        }
    )
    cp_path = os.path.join(log, f"{version:020d}.checkpoint.parquet")
    tmp = cp_path + f".tmp{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.rename(tmp, cp_path)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": n}, f)
