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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

STATES = ["Ohio", "Texas", "California", "Nevada", "Oregon", "Iowa", "Maine"]


def _gen_rows(seed: int, lo: int, hi: int, step: int) -> list[tuple]:
    """The deterministic row function both readers share: every field a
    pure function of (seed, i), identical in hashlib / Spark SQL /
    DuckDB md5."""
    out = []
    for i in range(lo, hi):
        h = hashlib.md5(f"cust|{seed}|{i}".encode()).hexdigest()
        out.append(
            (
                i,
                i // step,
                f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}",
                STATES[int(h[:6], 16) % len(STATES)],
                int(h[6:12], 16) % 100000,
            )
        )
    return out


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
        step = max(1, (self.n + self.p - 1) // self.p)
        yield from _gen_rows(self.seed, part.start, part.end, step)


class _SyntheticCustomersStreamReader(SimpleDataSourceStreamReader):
    """Bounded micro-batch stream over the same rows: offsets are plain
    row indices ({"i": next}), ``read`` advances one batch, and
    ``readBetweenOffsets`` regenerates any committed range exactly (the
    replay contract — determinism makes exactly-once trivial). Rows are
    returned as a materialized iterator because the simple reader
    pickles them driver-side; batch size bounds that memory."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 100))
        self.batch = max(1, int(options.get("batch", 25)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.batch, self.n)
        return iter(_gen_rows(self.seed, lo, hi, self.batch)), {"i": hi}

    def readBetweenOffsets(self, start, end):
        return iter(_gen_rows(self.seed, start["i"], end["i"], self.batch))


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

    def simpleStreamReader(self, schema):
        return _SyntheticCustomersStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotent registration of the engine's Python data sources."""
    spark.dataSource.register(SyntheticCustomersSource)
