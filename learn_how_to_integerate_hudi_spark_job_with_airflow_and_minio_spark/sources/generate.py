"""Distributed deterministic data generators (SURVEY §2.1 S2/S3).

The reference synthesizes rows driver-side with Faker
(``create_hudi_tables.py:49-84``: uuid4-keyed customers with
name/state/city/email/address + ISO created_at; orders with a random FK
into the customer ids, ``order_value`` as a *stringified* int 10–1000,
priority ∈ LOW/MEDIUM/HIGH, order_date within the last 30 days). That
pattern is a driver bottleneck at scale, so here generation runs on the
executors: ``spark.range(n)`` + deterministic hash-derived columns —
same schema and value domains (FIXTURES.md §A), seeded and reproducible,
no Python loop, no Faker dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATES = ["Ohio", "Texas", "California", "Nevada", "Oregon", "Iowa", "Maine"]
_CITIES = ["Springfield", "Columbus", "Austin", "Fresno", "Reno", "Salem", "Ames"]
_FIRST = ["Alex", "Sam", "Jordan", "Casey", "Riley", "Morgan", "Quinn", "Drew"]
_LAST = ["Smith", "Lee", "Patel", "Garcia", "Kim", "Chen", "Lopez", "Brown"]
_PRIORITIES = ["LOW", "MEDIUM", "HIGH"]


def _pick(col, options: list[str]):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(col, F.lit(len(options))) + 1).cast("int"))


def _uuid_like(col, seed: int, salt: str):
    """Deterministic uuid4-shaped key from a row id (stable across runs,
    unlike uuid4 — referential integrity for tests)."""
    h = F.md5(F.concat_ws("-", F.lit(salt), F.lit(seed), col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def customers_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Family-A customers (FIXTURES.md §A): key=customer_id,
    precombine=created_at (ISO string — lexical order == time order),
    partitionable by state."""
    i = F.col("id")
    h = F.pmod(F.xxhash64(i + F.lit(seed)), F.lit(10**9))
    return spark.range(n).select(
        _uuid_like(i, seed, "cust").alias("customer_id"),
        F.concat_ws(
            " ", _pick(h, _FIRST), _pick(F.pmod(h, F.lit(997)), _LAST)
        ).alias("name"),
        _pick(h + 1, _STATES).alias("state"),
        _pick(h + 2, _CITIES).alias("city"),
        F.concat(
            F.lit("user"), i.cast("string"), F.lit("@example.com")
        ).alias("email"),
        F.date_format(
            F.timestamp_seconds(F.lit(1700000000) + F.pmod(h, F.lit(86400 * 365))),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        ).alias("created_at"),
        F.concat_ws(
            "\n",
            F.concat((F.pmod(h, F.lit(9899)) + 100).cast("string"), F.lit(" Main St")),
            F.concat_ws(", ", _pick(h + 2, _CITIES), _pick(h + 1, _STATES)),
        ).alias("address"),
    )


def orders_df(
    spark: SparkSession, n: int, n_customers: int, seed: int = 42
) -> DataFrame:
    """Family-A orders: key=order_id, precombine=order_date
    (YYYY-MM-DD within a 30-day window); FK sampling into the customer id
    space is hash-derived — an executor-side analog of the reference's
    ``random.choice(customer_ids)`` with no driver-collected id list."""
    i = F.col("id")
    h = F.pmod(F.xxhash64(i + F.lit(seed * 7 + 1)), F.lit(10**9))
    fk = F.pmod(h, F.lit(n_customers))
    return spark.range(n).select(
        _uuid_like(i, seed, "order").alias("order_id"),
        F.concat(F.lit("order item "), F.pmod(h, F.lit(100)).cast("string")).alias(
            "name"
        ),
        (F.pmod(h, F.lit(991)) + 10).cast("string").alias("order_value"),
        _pick(h + 3, _PRIORITIES).alias("priority"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), F.pmod(h, F.lit(30)).cast("int")),
            "yyyy-MM-dd",
        ).alias("order_date"),
        _uuid_like(fk, seed, "cust").alias("customer_id"),
    )
