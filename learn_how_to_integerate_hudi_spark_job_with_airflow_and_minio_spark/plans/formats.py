"""File-format source/sink coverage: CSV, JSON-lines, ORC roundtrips
(SURVEY §2.5 notes the reference supports only Parquet-under-Hudi; a
complete engine reads and writes the standard formats).

Each query writes a slice of the testdata out in the target format and
reads it back with an explicit schema (no inferSchema in the engine's
read path — SURVEY §1.1 schema stance), then aggregates; the oracle runs
the same aggregate on the original parquet. Doubles survive the text
formats exactly because Spark emits shortest-roundtrip representations.
Also registers the skew-salting operators' queries (operators/skew.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_aggregate, salted_join
from ..session import load_tables
from .catalog import register

_AGG_ORACLE = """
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderstatus
"""

_SCHEMA = "o_orderkey long, o_orderstatus string, o_totalprice double"


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .cast("double")
        .alias("total"),
    )


@register(
    "source_csv_roundtrip",
    oracle=_AGG_ORACLE,
    doc="CSV sink + source (header, explicit schema — no inferSchema): "
    "write/read roundtrip preserves values exactly",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="engine_csv_")
    _slice(spark, sf_dir).write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(_SCHEMA).option("header", True).csv(out)
    return _agg(back)


@register(
    "source_json_roundtrip",
    oracle=_AGG_ORACLE,
    doc="JSON-lines sink + source with explicit schema",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="engine_json_")
    _slice(spark, sf_dir).write.mode("overwrite").json(out)
    back = spark.read.schema(_SCHEMA).json(out)
    return _agg(back)


@register(
    "source_orc_roundtrip",
    oracle=_AGG_ORACLE,
    doc="ORC sink + source (columnar alternative to parquet)",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tempfile.mkdtemp(prefix="engine_orc_")
    _slice(spark, sf_dir).write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return _agg(back)


@register(
    "skew_salted_agg",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="salted two-phase aggregate on a genuinely hot key (5 event types "
    "→ 5 reducers naively; salting spreads each key over 16): identical "
    "result, 16× lower max reducer load at scale",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return salted_aggregate(
        ev,
        keys=["event_type"],
        sum_cols={"total_value": F.col("value").cast("decimal(18,6)")},
        salt=16,
        salt_on="event_id",
    ).withColumn("total_value", F.col("total_value").cast("string").cast("double"))


@register(
    "skew_salted_join",
    oracle="""
        SELECT e.event_type, CAST(d.weight AS DOUBLE) AS weight, COUNT(*) AS n
        FROM events e
        JOIN (VALUES ('click', 1.0), ('view', 2.0), ('purchase', 10.0),
                     ('signup', 5.0), ('error', 0.0)) AS d(event_type, weight)
          ON e.event_type = d.event_type
        GROUP BY e.event_type, d.weight
    """,
    doc="salted replicate join on a hot key: right side duplicated per "
    "salt bucket, left deterministically salted — one hot key spreads "
    "over 16 shuffle tasks",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0), ("purchase", 10.0),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    joined = salted_join(ev, dim, "event_type", salt=16, salt_on="event_id")
    return joined.groupBy("event_type", "weight").agg(F.count(F.lit(1)).alias("n"))


@register(
    "source_csv_corrupt_records",
    # The malformed lines are fixed literals, so the expected parse is a
    # VALUES table — the oracle does not need a CSV reader at all.
    oracle="""
        SELECT * FROM (VALUES
            (1,                   'alpha',              10.5,  FALSE),
            (2,                   'beta',               20.0,  FALSE),
            (CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), TRUE),
            (4,                   CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), TRUE),
            (5,                   'comma,inside',       50.25, FALSE)
        ) AS t(id, name, score, is_corrupt)
    """,
    doc="malformed-input handling at ingest (PERMISSIVE mode + "
    "columnNameOfCorruptRecord): type-garbage and arity-garbage rows "
    "surface as corrupt records with null fields instead of failing the "
    "job — the bad-data posture a 100 TB ingest needs (badRecordsPath / "
    "DROPMALFORMED are the same machinery); quoted separators parse "
    "clean",
)
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = tempfile.mkdtemp(prefix="engine_badcsv_")
    lines = [
        "1,alpha,10.5",            # clean
        "2,beta,20.0",             # clean
        "x,gamma,oops",            # id AND score unparseable -> corrupt
        "4,delta,not_a_number",    # score unparseable -> corrupt
        '5,"comma,inside",50.25',  # quoted separator -> clean
    ]
    with open(f"{path}/data.csv", "w") as f:
        f.write("\n".join(lines) + "\n")
    df = spark.read.schema(
        "id long, name string, score double, _corrupt_record string"
    ).options(
        mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record"
    ).csv(path)
    return df.select(
        "id",
        F.when(F.col("_corrupt_record").isNull(), F.col("name")).alias("name"),
        "score",
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )


def _duck_md5_int(expr: str, lo: int, hi: int) -> str:
    """DuckDB integer from md5 hex nibbles [lo, hi) (0-based), mirroring
    python's int(h[lo:hi], 16)."""
    width = hi - lo
    poly = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {lo + j + 1}, 1)) - 1)"
        f" * {16 ** (width - 1 - j)}"
        for j in range(width)
    )
    return f"({poly})"


_PYDS_ORACLE = f"""
        WITH g AS (
            SELECT i,
                   CAST(i // 125 AS BIGINT) AS part_id,
                   md5('cust|42|' || CAST(i AS VARCHAR)) AS h,
                   {_duck_md5_int("'cust|42|' || CAST(i AS VARCHAR)", 0, 6)} AS s6,
                   {_duck_md5_int("'cust|42|' || CAST(i AS VARCHAR)", 6, 12)} AS s12
            FROM range(0, 1000) t(i)
        )
        SELECT i, part_id,
               substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
               substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
               substr(h, 21, 12) AS customer_id,
               ['Ohio', 'Texas', 'California', 'Nevada', 'Oregon',
                'Iowa', 'Maine'][(s6 % 7) + 1] AS state,
               CAST(s12 % 100000 AS BIGINT) AS acct
        FROM g
    """


@register(
    "source_python_datasource",
    # Every field is md5-derived, so DuckDB regenerates the connector's
    # exact output from range(): the oracle verifies a source that reads
    # from nothing.
    oracle=_PYDS_ORACLE,
    doc="custom Python data source (Spark 4 DataSource API): a connector "
    "registered from pure Python becomes a first-class "
    "spark.read.format(...) with partitioned executor-side reads — the "
    "extensibility path the reference's source dispatcher reserves "
    "(source_type DYNAMODB comment). Rows stream from a generator in "
    "Arrow batches; partition boundaries surface as part_id",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pysource import register_python_sources

    register_python_sources(spark)
    return (
        spark.read.format("synthetic_customers")
        .option("n", 1000)
        .option("partitions", 8)
        .option("seed", 42)
        .load()
    )
