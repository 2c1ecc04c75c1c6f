"""Arrow IPC (Feather v2 / RecordBatch stream) source and sink.

Parquet is the archival format; Arrow IPC is the interchange format —
zero-parse handoff to pandas/polars/DuckDB readers, mmap-able, and the
natural spill format for Arrow-native pipelines.  Both directions stay
DISTRIBUTED: the sink writes one `.arrows` stream file per partition
from inside ``mapInArrow`` (no driver collect), and the source turns
each file into one task via the ``binaryFile`` reader and re-emits its
record batches through ``mapInArrow``.

Scale notes: file count == writer parallelism, so `repartition(n)`
before writing controls file sizing exactly like any other sink; the
reader's unit of parallelism is the file (a 100 TB corpus written by
10k tasks reads back as 10k tasks).  One file must fit an executor's
memory — the same contract parquet row-groups already impose.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def write_arrow_ipc(df: DataFrame, path: str) -> DataFrame:
    """Write `df` as one Arrow IPC stream file per partition under
    `path`; returns the materialized (file, n_rows, n_bytes) manifest
    (the write happens when the manifest is materialized — this
    function forces it with a localCheckpoint so callers get
    write-then-manifest semantics like any other sink here).

    Empty partitions write nothing (no zero-row files polluting the
    directory).  File names are uuid-suffixed: re-running a failed
    write cannot silently overwrite a live file — the caller owns
    directory-level idempotency (write to temp dir + rename, the
    sinks.py discipline)."""
    os.makedirs(path, exist_ok=True)

    def _write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex}.arrows")
        writer = None
        n_rows = 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_stream(fname, batch.schema)
            writer.write_batch(batch)
            n_rows += batch.num_rows
        if writer is None:
            return
        writer.close()
        yield pa.RecordBatch.from_pydict(
            {
                "file": [os.path.basename(fname)],
                "n_rows": [n_rows],
                "n_bytes": [os.path.getsize(fname)],
            }
        )

    manifest = df.mapInArrow(_write, MANIFEST_SCHEMA)
    # force the write exactly once; manifest survives re-use
    return manifest.localCheckpoint(eager=True)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Arrow IPC stream files as a DataFrame —
    one task per file via the binaryFile source, batches re-emitted
    through mapInArrow (bytes never hit the driver).

    The output schema is taken from the first file (driver-side peek
    of ONE schema message, not data); files with mismatched schemas
    fail loudly inside the task."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".arrows")
    )
    if not files:
        raise FileNotFoundError(f"no .arrows files under {path}")
    with pa.ipc.open_stream(files[0]) as r:
        arrow_schema = r.schema
    from pyspark.sql.pandas.types import from_arrow_schema

    # tz-naive arrow timestamps round-trip as TIMESTAMP_NTZ (a plain
    # conversion would silently re-type them as session-tz TIMESTAMP)
    spark_schema = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)

    bin_df = spark.read.format("binaryFile").load(
        os.path.join(path, "*.arrows")
    ).select("content")

    def _read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for blob in batch.column("content"):
                with pa.ipc.open_stream(blob.as_py()) as reader:
                    yield from reader

    return bin_df.mapInArrow(_read, spark_schema)
