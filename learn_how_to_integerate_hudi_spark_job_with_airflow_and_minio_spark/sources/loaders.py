"""Declarative source dispatcher (SURVEY §2.1 S7).

Rebuilds the reference's ``Loaders``/``HudiLoader`` surface
(``incremental_etl_orders.py:340-412``) with the same JSON payload shape
(``incremental_etl_orders.py:27-46``)::

    [{"source_type": "ENGINE",          # reference: "HUDI"
      "table_name": "orders",
      "spark_table_name": "orders",     # temp-view name bound in the catalog
      "path": "<table path>",
      "type": "INC" | "FULL"},
     ...]

FULL → snapshot read (S4); INC → checkpointed incremental read (S6). Each
loaded source is registered as a temp view (the reference's universal
``createOrReplaceTempView`` catalog pattern). The registry is extensible
by ``source_type`` — the reference reserves e.g. DYNAMODB
(``incremental_etl_orders.py:31``); we additionally ship a plain PARQUET
source out of the box.

Checkpoint ordering fix (SURVEY §2.6): INC loads do NOT advance their
checkpoint; :meth:`Loaders.commit_checkpoints` does, and the caller
invokes it after the downstream write succeeds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..checkpoint import CheckpointStore, IncrementalReader
from ..table import Table


class Loaders:
    def __init__(
        self,
        payload: list[dict],
        spark: SparkSession,
        checkpoint_store: CheckpointStore | None = None,
    ):
        self.payload = payload
        self.spark = spark
        self.store = checkpoint_store
        self._pending: list[tuple[IncrementalReader, str]] = []
        self._handlers: dict[str, Callable[[dict], DataFrame | None]] = {
            "ENGINE": self._load_engine,
            "HUDI": self._load_engine,  # reference payloads name it HUDI
            "PARQUET": self._load_parquet,
        }

    def register(self, source_type: str, fn: Callable[[dict], DataFrame | None]):
        self._handlers[source_type] = fn

    def load(self) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for item in self.payload:
            stype = item["source_type"]
            handler = self._handlers.get(stype)
            if handler is None:
                raise ValueError(f"unknown source_type: {stype}")
            df = handler(item)
            if df is not None:
                view = item.get("spark_table_name", item["table_name"])
                df.createOrReplaceTempView(view)
                out[view] = df
        return out

    def commit_checkpoints(self) -> None:
        """Advance all INC checkpoints — call after the downstream write."""
        for reader, hwm in self._pending:
            reader.commit(hwm)
        self._pending.clear()

    # -- handlers --------------------------------------------------------

    def _load_engine(self, item: dict) -> DataFrame | None:
        table = Table.load(self.spark, item["path"])
        if item.get("type", "FULL").upper() == "FULL":
            return table.snapshot()
        if self.store is None:
            raise ValueError("INC source requires a checkpoint_store")
        reader = IncrementalReader(table, self.store, name=item["table_name"])
        df, hwm = reader.read()
        if df is None:
            return None  # empty timeline: nothing to bind (guarded cold start)
        if hwm is not None:
            self._pending.append((reader, hwm))
        return df

    def _load_parquet(self, item: dict) -> DataFrame:
        return self.spark.read.parquet(item["path"])
