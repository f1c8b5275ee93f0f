"""Custom Python data source (Spark 4 DataSource API) — the
extensibility path for the reference's source dispatcher (SURVEY §2.1
S7: the payload's ``source_type`` comment names DYNAMODB as a future
source, ``incremental_etl_orders.py:31``). A connector written in pure
Python registers with ``spark.dataSource.register`` and is then a
first-class ``spark.read.format(...)`` — partitioned, executor-side,
no driver loop.

This module ships a deterministic synthetic-customers source (the S2
generator re-expressed as a connector): every field derives from
``md5(salt|seed|i)``, so the SAME rows are computable in executor
Python (hashlib), Spark SQL, and DuckDB — which is what lets the
driver's oracle verify a connector that reads from nothing.

Scale shape: ``partitions()`` splits the id range; each executor task
generates only its slice (``read`` is a generator — rows stream out in
Arrow batches, never materializing a partition in memory).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

STATES = ["Ohio", "Texas", "California", "Nevada", "Oregon", "Iowa", "Maine"]


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, pid: int):
        self.start, self.end, self.pid = start, end, pid


class _SyntheticCustomersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 100))
        self.p = max(1, int(options.get("partitions", 4)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, (self.n + self.p - 1) // self.p)
        return [
            _RangePartition(lo, min(lo + step, self.n), lo // step)
            for lo in range(0, self.n, step)
        ]

    def read(self, part: _RangePartition):
        for i in range(part.start, part.end):
            h = hashlib.md5(f"cust|{self.seed}|{i}".encode()).hexdigest()
            yield (
                i,
                part.pid,
                f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}",
                STATES[int(h[:6], 16) % len(STATES)],
                int(h[6:12], 16) % 100000,
            )


class SyntheticCustomersSource(DataSource):
    """``spark.read.format("synthetic_customers").option("n", N)`` —
    options: n (rows), partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_customers"

    def schema(self) -> str:
        return "i long, part_id long, customer_id string, state string, acct long"

    def reader(self, schema):
        return _SyntheticCustomersReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotent registration of the engine's Python data sources."""
    spark.dataSource.register(SyntheticCustomersSource)
