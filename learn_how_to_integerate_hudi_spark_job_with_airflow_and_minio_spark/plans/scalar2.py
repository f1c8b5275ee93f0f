"""Second scalar/aggregate batch: hash functions, edit distance,
extended regexp, moment-based correlation/covariance, exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register


@register(
    "scalar_hash_funcs",
    oracle="""
        SELECT p_partkey,
               md5(p_name)          AS name_md5,
               sha256(p_name)       AS name_sha256,
               md5(concat(p_brand, '|', p_type)) AS brand_type_md5
        FROM part
    """,
    doc="cryptographic hash family (md5 / sha256): content addressing "
    "and dedup keys — identical hex across engines",
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.md5(F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type"))).alias(
            "brand_type_md5"
        ),
    )


@register(
    "scalar_levenshtein",
    oracle="""
        SELECT p_partkey, p_brand,
               levenshtein(p_brand, 'Brand#10') AS dist_to_b10,
               levenshtein(p_type, 'STANDARD')  AS dist_to_standard
        FROM part
    """,
    doc="edit distance (levenshtein): fuzzy string matching primitive",
)
def scalar_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        "p_brand",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10"))
        .cast("long")
        .alias("dist_to_b10"),
        F.levenshtein(F.col("p_type"), F.lit("STANDARD"))
        .cast("long")
        .alias("dist_to_standard"),
    )


@register(
    "scalar_regexp_extended",
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, 'the'))            AS n_the,
               regexp_matches(text, '^[a-z ]+$')               AS all_lower,
               regexp_replace(text[1:40], '(a|the) ', '<\\1> ', 'g') AS art_tagged
        FROM documents
    """,
    doc="extended regexp: match-count (regexp_count), predicate (rlike), "
    "global replace with backreference",
)
def scalar_regexp_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("the")).cast("long").alias("n_the"),
        F.col("text").rlike("^[a-z ]+$").alias("all_lower"),
        F.regexp_replace(
            F.substring(F.col("text"), 1, 40), r"(a|the) ", "<$1> "
        ).alias("art_tagged"),
    )


@register(
    "agg_corr_covar",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               n,
               (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
               (sxy - sx * sy / n)
                   / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
        FROM m
    """,
    doc="covariance/correlation from exact decimal moment sums — "
    "order-independent, bit-identical across engines (native corr/covar "
    "aggregates stream in engine-specific orders)",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")

    def d(c):
        return F.sum(c).cast("string").cast("double")

    n = F.count(F.lit(1))
    sx, sy, sxx, syy, sxy = d(x), d(y), d(x * x), d(y * y), d(x * y)
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        cov.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    )


@register(
    "agg_exact_percentile",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5)  AS median_qty,
               quantile_cont(l_quantity, 0.9)  AS p90_qty,
               max(l_quantity)                 AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="exact percentiles (linear interpolation): Spark percentile vs "
    "DuckDB quantile_cont — same continuous-quantile definition",
)
def agg_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 4096 AS orred,
               xor(o_orderkey, 1365) AS xored,
               o_orderkey << 3 AS shl,
               o_orderkey >> 2 AS shr,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        FROM orders
    """,
    doc="bitwise expression surface: AND/OR/XOR/shifts/popcount — the "
    "primitives under the engine's own simhash banding and z-order "
    "interleave, exposed as user-facing scalar functions",
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("orred"),
        k.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "scalar_variant_json",
    # Spark 4 VARIANT type: parse once into the binary-JSON variant,
    # typed path extraction with variant_get (shredded access — no
    # per-path string re-parse, unlike get_json_object). The JSON is
    # synthesized from event columns so the nested/array paths are
    # non-trivial; DuckDB extracts from the identical string.
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(j, '$.meta.type') AS VARCHAR) AS etype,
               CAST(json_extract_string(j, '$.meta.uid') AS BIGINT)   AS uid,
               CAST(json_extract_string(j, '$.vals[1]') AS DOUBLE)    AS second_val,
               json_extract_string(j, '$.meta.missing')               AS missing
        FROM (
            SELECT event_id,
                   concat('{"meta": {"type": "', event_type,
                          '", "uid": ', CAST(user_id AS VARCHAR),
                          '}, "vals": [', CAST(round(value, 3) AS VARCHAR),
                          ', ', CAST(round(value * 2, 3) AS VARCHAR), ']}') AS j
            FROM events WHERE value IS NOT NULL
        )
    """,
    doc="Spark 4 VARIANT: parse_json once -> variant_get typed paths "
    "(nested object, array index, missing path -> null) — the "
    "shredded semi-structured access path, vs the per-call string "
    "re-parse of get_json_object (covered by scalar_json_funcs)",
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    j = F.concat(
        F.lit('{"meta": {"type": "'), F.col("event_type"),
        F.lit('", "uid": '), F.col("user_id").cast("string"),
        F.lit('}, "vals": ['), F.round("value", 3).cast("string"),
        F.lit(", "), F.round(F.col("value") * 2, 3).cast("string"),
        F.lit("]}"),
    )
    return (
        ev.where(F.col("value").isNotNull())
        .withColumn("_v", F.parse_json(j))
        .select(
            "event_id",
            F.variant_get("_v", "$.meta.type", "string").alias("etype"),
            F.variant_get("_v", "$.meta.uid", "long").alias("uid"),
            F.variant_get("_v", "$.vals[1]", "double").alias("second_val"),
            F.variant_get("_v", "$.meta.missing", "string").alias("missing"),
        )
    )


@register(
    "scalar_try_functions",
    # DuckDB lacks Spark's try_* family; the oracle reproduces each
    # null-on-error contract explicitly (CASE guards / TRY_CAST), which
    # doubles as documentation of exactly what the functions swallow.
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity > 25 THEN NULL
                    ELSE round(l_extendedprice / l_quantity, 6)
               END AS safe_ratio,
               CAST(NULL AS DOUBLE) AS div_by_zero,
               TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
               CAST(NULL AS BIGINT) AS overflow_add,
               TRY_CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_orderkey % 100 = 0
    """,
    doc="ANSI-safe error-handling scalars (try_divide / try_cast / "
    "try_add): errors become NULL instead of failing the job — "
    "division by a data-dependent zero, non-numeric casts, bigint "
    "overflow — the posture that keeps a 100 TB batch alive through "
    "dirty cells while ANSI mode stays ON for genuine bugs",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].where(
        F.col("l_orderkey") % 100 == 0
    )
    denom = F.when(F.col("l_quantity") > 25, F.lit(0.0)).otherwise(
        F.col("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), denom), 6).alias(
            "safe_ratio"
        ),
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") * 0.0).alias(
            "div_by_zero"
        ),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"),
            F.ceil(F.col("l_quantity")).cast("long"),
        ).alias("overflow_add"),
        F.expr("try_cast(CAST(l_shipdate AS STRING) AS DATE)").alias("ship_date"),
    )


@register(
    "scalar_collation_lcase",
    # The collated GROUP BY keeps an arbitrary-case representative, so
    # the output key is normalized with lower() — the oracle groups on
    # lower() directly.
    oracle="""
        SELECT lower(w) AS word, COUNT(*) AS n
        FROM (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                        ELSE lower(c_mktsegment) END AS w
            FROM customer
        )
        GROUP BY lower(w)
    """,
    doc="collation-aware comparison (Spark 4 COLLATE): grouping under "
    "UTF8_LCASE treats case variants as equal AT THE COMPARISON LEVEL — "
    "unlike lower()-normalization it preserves original values and "
    "composes with joins/sorts/aggregations wherever the collated type "
    "flows",
)
def scalar_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    mixed = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.lower("c_mktsegment")).alias("w")
    )
    return (
        mixed.groupBy(F.collate(F.col("w"), "UTF8_LCASE").alias("_wc"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            # the collated type propagates through lower(); collate back
            # to UTF8_BINARY so the result schema is a plain string
            F.collate(F.lower(F.col("_wc")), "UTF8_BINARY").alias("word"),
            "n",
        )
    )
