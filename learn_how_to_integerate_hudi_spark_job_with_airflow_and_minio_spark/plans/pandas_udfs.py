"""Pandas-UDF family coverage (SURVEY §7 preference order (b): the
Arrow-batched escape hatch when built-ins can't express an operator).

Each flavor is demonstrated with a computation whose result is exactly
SQL-expressible, so the Python path itself is oracle-checked:

- scalar ``@pandas_udf`` — vectorized Series→Series;
- grouped-map ``applyInPandas`` — per-group pandas DataFrame in/out
  (stable-sorted rank, equal to the SQL row_number);
- ``mapInPandas`` is covered by operators/multimodal.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..session import load_tables
from .catalog import register


@register(
    "pandas_udf_scalar",
    oracle="""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens_py
        FROM documents
    """,
    doc="scalar pandas UDF (Arrow-vectorized Series→Series): token count "
    "in Python, oracle-checked against the SQL tokenizer",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def py_token_count(s: pd.Series) -> pd.Series:
        return s.str.strip().str.split(r"\s+").map(len).astype("int64")

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return d.select("doc_id", py_token_count(F.col("text")).alias("n_tokens_py"))


@register(
    "pandas_grouped_map_rank",
    oracle="""
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS spend_rank
        FROM orders
    """,
    doc="grouped-map applyInPandas: per-customer spend rank computed in "
    "pandas (stable sort), oracle-checked against the SQL row_number — "
    "the template for custom per-group logic Spark lacks",
)
def pandas_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        pdf["spend_rank"] = range(1, len(pdf) + 1)
        return pdf[["o_custkey", "o_orderkey", "spend_rank"]]

    o = load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy("o_custkey").applyInPandas(
        rank_group, schema="o_custkey long, o_orderkey long, spend_rank long"
    )
