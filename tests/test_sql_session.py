"""SqlSession: the one-entry-point statement router over a shared
{name: Table} catalog.

Pins the routing table (query -> sql_over with pruning/time-travel,
DML -> execute, DDL -> execute_ddl, CALL -> call_procedure), the
implicit view binding for embedded SELECTs (INSERT .. SELECT and CTAS
read catalog tables by name with no prior attach), referenced-only
view binding on reads, and the ;-script runner."""

from __future__ import annotations

import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_session import (
    SqlSession,
    _strip_quoted,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
)

PROPS = "TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ver')"


@pytest.fixture
def sess(spark, tmp_path):
    return SqlSession(spark, base_dir=str(tmp_path))


def test_full_lifecycle_via_one_entry_point(spark, sess):
    t = sess.sql(
        f"CREATE TABLE items (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    assert isinstance(t, Table) and "items" in sess.catalog
    c = sess.sql("INSERT INTO items VALUES (1, 1, 10.0), (2, 1, 20.0)")
    assert isinstance(c, str)
    # read routes through sql_over (auto-pruned view binding)
    assert sess.sql("SELECT sum(amt) AS s FROM items").collect()[0].s == 30.0
    # DML references the catalog table in an embedded SELECT
    sess.sql(
        f"CREATE TABLE copies (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql("INSERT INTO copies SELECT id, ver, amt * 2 FROM items")
    assert (
        sess.sql("SELECT sum(amt) AS s FROM copies").collect()[0].s == 60.0
    )
    # MERGE with a catalog-table source
    sess.sql(
        "MERGE INTO items t USING copies s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt"
    )
    assert sess.sql("SELECT sum(amt) AS s FROM items").collect()[0].s == 60.0
    # CALL returns a DataFrame
    commits = sess.sql("CALL show_commits(table => 'items')")
    assert commits.count() >= 2
    # DDL reads
    assert sess.sql("SHOW TABLES").count() == 2
    # DROP mutates the catalog
    sess.sql("DROP TABLE copies")
    assert sorted(sess.catalog) == ["items"]


def test_ctas_reads_catalog_table_by_name(spark, sess):
    sess.sql(
        f"CREATE TABLE src (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql("INSERT INTO src VALUES (1, 1, 5.0), (2, 1, 50.0)")
    t = sess.sql(
        f"CREATE TABLE big USING engine {PROPS} "
        "AS SELECT * FROM src WHERE amt > 10"
    )
    assert t.snapshot().count() == 1


def test_time_travel_through_session(spark, sess):
    sess.sql(
        f"CREATE TABLE tt (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql("INSERT INTO tt VALUES (1, 1, 1.0)")
    sess.sql("UPDATE tt SET amt = 99.0 WHERE id = 1")
    assert (
        sess.sql("SELECT amt FROM tt VERSION AS OF 1").collect()[0].amt
        == 1.0
    )
    assert sess.sql("SELECT amt FROM tt").collect()[0].amt == 99.0


def test_reads_bind_only_referenced_views(spark, sess, monkeypatch):
    sess.sql(
        f"CREATE TABLE a (id bigint, ver bigint) USING engine {PROPS}"
    )
    sess.sql(
        f"CREATE TABLE b (id bigint, ver bigint) USING engine {PROPS}"
    )
    sess.sql("INSERT INTO a VALUES (1, 1)")
    sess.sql("INSERT INTO b VALUES (2, 1)")
    seen = {}
    import learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_session as mod

    real = mod.sql_over

    def spy(spark_, tables, query, **kw):
        seen["names"] = sorted(tables)
        return real(spark_, tables, query, **kw)

    monkeypatch.setattr(mod, "sql_over", spy)
    sess.sql("SELECT count(*) AS n FROM a").collect()
    assert seen["names"] == ["a"]
    # quoted text never pulls in a view
    sess.sql("SELECT 'b' AS tag, count(*) AS n FROM a").collect()
    assert seen["names"] == ["a"]
    # backticked identifiers do
    sess.sql("SELECT count(*) AS n FROM `b`").collect()
    assert seen["names"] == ["b"]


def test_script_runs_in_order_returns_last(spark, sess):
    out = sess.script(
        f"""
        CREATE TABLE s1 (id bigint, ver bigint, note string)
            USING engine {PROPS};
        INSERT INTO s1 VALUES (1, 1, 'a;b');
        INSERT INTO s1 VALUES (2, 1, 'plain');
        SELECT id, note FROM s1 ORDER BY id;
        """
    )
    rows = out.collect()
    assert [(r.id, r.note) for r in rows] == [(1, "a;b"), (2, "plain")]
    with pytest.raises(ValueError, match="no statements"):
        sess.script("   ;  ;  ")


def test_attach_and_unknown_keyword(spark, sess, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "ext"), key="id", precombine="ver",
        table_name="ext",
    )
    t.bulk_insert(
        spark.createDataFrame([(7, 1)], "id long, ver long")
    )
    sess.attach("ext", str(tmp_path / "ext"))
    assert sess.sql("SELECT id FROM ext").collect()[0].id == 7
    with pytest.raises(ValueError, match="already attached"):
        sess.attach("ext", t)
    with pytest.raises(ValueError, match="unrecognized statement"):
        sess.sql("GRANT ALL ON items TO nobody")


def test_truncate_routes_through_session(spark, sess):
    sess.sql(
        f"CREATE TABLE tr (id bigint, ver bigint) USING engine {PROPS}"
    )
    sess.sql("INSERT INTO tr VALUES (1, 1), (2, 1)")
    c = sess.sql("TRUNCATE TABLE tr")
    assert isinstance(c, str)
    assert sess.sql("SELECT count(*) AS n FROM tr").collect()[0].n == 0


def test_strip_quoted():
    assert "secret" not in _strip_quoted("SELECT 'secret' FROM a")
    assert "lit" not in _strip_quoted('SELECT "lit" FROM a')
    s = _strip_quoted("SELECT * FROM `weird name`")
    assert "weird" in s
    # unterminated quote: rest of string is blanked, no crash
    assert _strip_quoted("SELECT 'oops FROM a").startswith("SELECT")


def test_merge_using_table_changes_tvf(spark, tmp_path):
    """table_changes() inside a MERGE's USING subquery binds the
    incremental window before the DML parse — the pure-SQL
    incremental-ETL idiom."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_session import (
        SqlSession,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    bt = Table.create(
        spark, str(tmp_path / "b"), key="k", precombine="v", table_name="b"
    )
    c1 = bt.upsert(
        spark.createDataFrame([(1, 1, 10.0), (2, 1, 20.0)], "k int, v int, amt double")
    )
    bt.upsert(
        spark.createDataFrame([(2, 2, 99.0), (3, 1, 30.0)], "k int, v int, amt double")
    )
    gt = Table.create(
        spark, str(tmp_path / "g"), key="k", precombine="v", table_name="g"
    )
    gt.upsert(
        spark.createDataFrame([(1, 1, 10.0), (2, 1, 20.0)], "k int, v int, amt double")
    )
    sess = SqlSession(spark, tables={"bronze": bt, "gold": gt})
    sess.sql(
        f"""
        MERGE INTO gold USING (
            SELECT k, v, amt FROM table_changes(bronze, 'latest_state', '{c1}')
        ) s ON gold.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    assert sorted((r.k, r.amt) for r in gt.snapshot().collect()) == [
        (1, 10.0),
        (2, 99.0),
        (3, 30.0),
    ]


def test_tvf_text_inside_string_literal_binds_nothing(spark, tmp_path):
    """table_changes text inside a string literal must not trigger a
    manifest replay / snapshot attach for the named table."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.catalog_api import (
        tc_referenced_names,
    )

    assert tc_referenced_names(
        "SELECT 'ran table_changes(''bronze'', ''cdc'', ''1'')' AS lit"
    ) == set()
    assert tc_referenced_names(
        "-- table_changes(bronze, 'cdc', '1')\nSELECT 1"
    ) == set()
    assert tc_referenced_names(
        "SELECT * FROM table_changes('bronze', 'latest_state', '1')"
    ) == {"bronze"}


def test_dml_subquery_binds_referenced_views(spark, sess):
    """DELETE/UPDATE whose predicate embeds a subquery get the same
    implicit view binding as INSERT..SELECT — a cross-table subquery
    resolves catalog tables by name with no prior attach."""
    sess.sql(
        f"CREATE TABLE facts (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql(
        f"CREATE TABLE bans (id bigint, ver bigint, why string) "
        f"USING engine {PROPS}"
    )
    sess.sql(
        "INSERT INTO facts VALUES (1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0)"
    )
    sess.sql("INSERT INTO bans VALUES (2, 1, 'spam')")
    sess.sql("DELETE FROM facts WHERE id IN (SELECT id FROM bans)")
    assert [
        r.id for r in sess.sql("SELECT id FROM facts ORDER BY id").collect()
    ] == [1, 3]
    # UPDATE with a scalar subquery over ANOTHER catalog table
    sess.sql(
        "UPDATE facts SET amt = amt + (SELECT count(*) FROM bans) "
        "WHERE id = 1"
    )
    got = {
        r.id: r.amt
        for r in sess.sql("SELECT id, amt FROM facts").collect()
    }
    assert got == {1: 11.0, 3: 30.0}


def test_delete_subquery_over_table_changes_tvf(spark, sess):
    """The table_changes() TVF rewrites inside a DELETE's subquery just
    as it does inside MERGE USING — retention driven by a CDC window in
    one SQL string."""
    sess.sql(
        f"CREATE TABLE src (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql(
        f"CREATE TABLE tgt (id bigint, ver bigint, amt double) "
        f"USING engine {PROPS}"
    )
    sess.sql("INSERT INTO tgt VALUES (1, 1, 1.0), (2, 1, 2.0), (3, 1, 3.0)")
    sess.sql("INSERT INTO src VALUES (2, 1, 0.0)")  # commit 1
    begin = sess.catalog["src"].latest_commit()
    sess.sql("INSERT INTO src VALUES (3, 1, 0.0)")  # commit 2 (the window)
    sess.sql(
        "DELETE FROM tgt WHERE id IN "
        f"(SELECT id FROM table_changes('src', 'latest_state', '{begin}'))"
    )
    assert [
        r.id for r in sess.sql("SELECT id FROM tgt ORDER BY id").collect()
    ] == [1, 2]
