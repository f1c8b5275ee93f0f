"""Session S3A conf parity (O2), multi-commit soak, Python UDTF demo."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (
    build_session,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
    TableServices,
)


def test_s3a_conf_surface(spark):
    """build_session(s3=...) sets the same Hadoop conf keys the reference
    sets through spark._jsc (incremental_etl_orders.py:55-63)."""
    s = build_session(
        app_name="s3conf",
        s3={"endpoint": "http://minio:9000", "access_key": "ak", "secret_key": "sk"},
    )
    h = s._jsc.hadoopConfiguration()
    assert h.get("fs.s3a.endpoint") == "http://minio:9000"
    assert h.get("fs.s3a.access.key") == "ak"
    assert h.get("fs.s3a.secret.key") == "sk"
    assert h.get("fs.s3a.path.style.access") == "true"
    assert h.get("fs.s3a.connection.ssl.enabled") == "false"


def test_many_commit_soak(spark, tmp_path):
    """10 mixed commits + compaction + clean: snapshot stays correct and
    the live file count stays bounded."""
    t = Table.create(
        spark, str(tmp_path / "soak"), key="id", precombine="ver", table_name="soak"
    )
    expected: dict[int, tuple] = {}
    for c in range(10):
        rows = [(k, c, f"v{c}_{k}") for k in range(c % 3, 30, 3)]
        t.upsert(spark.createDataFrame(rows, "id long, ver long, val string"))
        for k, v, val in rows:
            expected[k] = (v, val)
    got = {r["id"]: (r["ver"], r["val"]) for r in t.snapshot().collect()}
    assert got == expected

    TableServices(t).compact(sort_cols=["id"])
    TableServices(t).clean(retain_commits=2)
    got2 = {r["id"]: (r["ver"], r["val"]) for r in t.snapshot().collect()}
    assert got2 == expected
    assert len(t.current_files()) <= 8  # compacted layout stays small


@pytest.mark.filterwarnings("ignore")
def test_python_udtf(spark):
    """Python UDTF (table function): one input row → many output rows,
    the last UDF flavor in the matrix."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    out = spark.sql(
        "SELECT * FROM tokenize_udtf('spark native engine')"
    ).collect()
    assert [(r["word"], r["pos"]) for r in out] == [
        ("spark", 0), ("native", 1), ("engine", 2)
    ]


def test_bench_headline_subset_of_catalog():
    import bench
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog import (
        queries,
    )

    missing = [n for n in bench.HEADLINE if n not in queries()]
    assert not missing, f"bench references unknown queries: {missing}"


def test_bigram_logprob_single_token_doc_safe(spark):
    """sequence(1, 0) descends in Spark: a 1-token doc must contribute
    ZERO bigrams (and not pollute the count tables with null pairs),
    matching DuckDB's empty range."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "one"), (2, "two words here"), (3, "")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = REGISTRY["text_bigram_logprob"].spark_fn(spark, d)
    rows = {r["doc_id"]: r["n_bigrams"] for r in out.collect()}
    assert rows == {2: 2}  # only the 3-token doc scores; no null pairs
