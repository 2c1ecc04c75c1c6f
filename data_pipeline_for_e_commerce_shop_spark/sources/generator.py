"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic partitioned synthetic-row generator — the dbgen/dsdgen
shape, "scan 100 TB without storing 100 TB".

Why it belongs in the engine: benchmark and soak data should be a
SOURCE, not a staged copy; a generator source parallelizes like any
scan (each input partition generates its own id range on its executor,
zero data movement) and its rows are a pure function of row_id, so any
slice is reproducible anywhere — including inside DuckDB, which makes
a generator-backed query value-hash checkable like every other query
here (both engines derive columns from md5(row_id)).

The reference stages fixture CSVs by hand (data/*.csv committed to the
repo); this is that fixture surface as an executable contract.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

GEN_ROWS = 10_000  # default row count
GEN_PARTITIONS = 8  # default parallelism
GEN_CATEGORIES = 8
GEN_CENTS_MOD = 100_000


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SyntheticGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", GEN_ROWS))
        self.parts = int(options.get("partitions", GEN_PARTITIONS))

    def partitions(self):  # noqa: D102 — API contract
        step = -(-self.n // self.parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):  # noqa: D102
        import hashlib

        for i in range(partition.lo, partition.hi):
            h = hashlib.md5(f"gen-{i}".encode()).hexdigest()
            yield (
                i,
                f"cat{int(h[:8], 16) % GEN_CATEGORIES}",
                int(h[8:16], 16) % GEN_CENTS_MOD,
            )


class SyntheticGenSource(DataSource):
    """``spark.read.format("syntheticgen").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "syntheticgen"

    def schema(self) -> str:
        return "row_id bigint, category string, value_cents bigint"

    def reader(self, schema) -> SyntheticGenReader:
        return SyntheticGenReader(self.options)


def register_generator(spark) -> None:
    """Idempotently register the source on the session."""
    spark.dataSource.register(SyntheticGenSource)
