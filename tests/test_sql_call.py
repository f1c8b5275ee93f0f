"""CALL procedure surface (sql_dml.call_procedure): the Hudi Spark-SQL
procedure family over the engine's table services.

Pins the parser contract (named args only, quoted strings, unknown
procedure/argument/table raise), each procedure's effect on the table,
and the cross-procedure interplay the catalog query relies on
(savepoint protects files through run_clean so rollback_to_savepoint
still materializes)."""

from __future__ import annotations

import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_dml import (
    _parse_call,
    call_procedure,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
)


@pytest.fixture
def t(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "t"), key="id", precombine="ver",
        table_name="t", max_records_per_file=2,
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(i, 1, i * 10.0) for i in range(6)],
            "id long, ver long, amt double",
        )
    )
    return t


def _rows(t):
    return sorted((r.id, r.amt) for r in t.snapshot().select("id", "amt").collect())


# -- parser ----------------------------------------------------------


def test_parse_call_shapes():
    name, args = _parse_call(
        "CALL run_clustering(table => 't', order => 'a,b', zorder => true,"
        " target_records_per_file => 4096);"
    )
    assert name == "run_clustering"
    assert args == {
        "table": "t", "order": "a,b", "zorder": True,
        "target_records_per_file": 4096,
    }
    # string values keep their content verbatim (commas inside quotes
    # don't split; => inside quotes is not an argument separator)
    _, args = _parse_call("CALL show_commits(table => 'a => b, c')")
    assert args == {"table": "a => b, c"}


def test_parse_call_rejects_bad_shapes():
    with pytest.raises(ValueError, match="not a CALL"):
        _parse_call("SELECT 1")
    with pytest.raises(ValueError, match="named"):
        _parse_call("CALL show_commits('t')")  # positional
    with pytest.raises(ValueError, match="duplicate"):
        _parse_call("CALL x(table => 't', table => 'u')")


def test_call_unknowns_raise(spark, t):
    tabs = {"t": t}
    with pytest.raises(ValueError, match="unknown CALL procedure"):
        call_procedure(spark, "CALL frobnicate(table => 't')", tabs)
    with pytest.raises(ValueError, match="unknown CALL target"):
        call_procedure(spark, "CALL show_commits(table => 'nope')", tabs)
    with pytest.raises(ValueError, match="needs a table"):
        call_procedure(spark, "CALL show_commits(limit => 1)", tabs)
    with pytest.raises(ValueError, match="unexpected argument"):
        call_procedure(
            spark, "CALL show_commits(table => 't', bogus => 1)", tabs
        )


# -- show_* ----------------------------------------------------------


def test_show_commits_and_properties(spark, t):
    tabs = {"t": t}
    t.upsert(spark.createDataFrame([(1, 2, 99.0)], "id long, ver long, amt double"))
    rows = call_procedure(
        spark, "CALL show_commits(table => 't')", tabs
    ).collect()
    assert [r.commit for r in rows] == sorted(t.commits(), reverse=True)
    assert rows[0].action == "upsert" and rows[-1].action == "bulk_insert"
    one = call_procedure(
        spark, "CALL show_commits(table => 't', limit => 1)", tabs
    ).collect()
    assert len(one) == 1 and one[0].commit == t.latest_commit()
    props = {
        r.key: r.value
        for r in call_procedure(
            spark, "CALL show_table_properties(table => 't')", tabs
        ).collect()
    }
    assert props["record_key"] == "id" and props["precombine"] == "ver"
    assert props["table_type"] == "cow"
    files = call_procedure(
        spark, "CALL show_fsview_all(table => 't')", tabs
    ).collect()
    assert {e["path"] for e in t.current_files()} == {r.path for r in files}


# -- savepoints / rollback --------------------------------------------


def test_savepoint_roundtrip_and_rollback(spark, t):
    tabs = {"t": t}
    c1 = t.latest_commit()
    sp = call_procedure(
        spark, f"CALL create_savepoint(table => 't', commit_time => '{c1}')",
        tabs,
    ).collect()
    assert sp == [(c1, True)] or (sp[0].savepoint_time == c1 and sp[0].result)
    got = call_procedure(
        spark, "CALL show_savepoints(table => 't')", tabs
    ).collect()
    assert [r.savepoint_time for r in got] == [c1]
    before = _rows(t)
    t.upsert(spark.createDataFrame([(0, 2, -1.0)], "id long, ver long, amt double"))
    assert _rows(t) != before
    rb = call_procedure(
        spark,
        f"CALL rollback_to_savepoint(table => 't', instant_time => '{c1}')",
        tabs,
    ).collect()[0]
    assert rb.result and rb.commit == t.latest_commit()
    assert _rows(t) == before
    # releasing the pin works; rolling back to an unpinned commit via
    # rollback_to_savepoint refuses (Hudi's contract), to_instant allows
    call_procedure(
        spark, f"CALL delete_savepoint(table => 't', instant_time => '{c1}')",
        tabs,
    )
    assert t.savepoints() == []
    with pytest.raises(ValueError, match="not savepointed"):
        call_procedure(
            spark,
            f"CALL rollback_to_savepoint(table => 't', instant_time => '{c1}')",
            tabs,
        )
    call_procedure(
        spark,
        f"CALL rollback_to_instant(table => 't', instant_time => '{c1}')",
        tabs,
    )
    assert _rows(t) == before


def test_savepoint_protects_through_clean(spark, t):
    """The catalog query's interplay: savepoint → churn commits →
    run_clean with a 1-commit window → the savepointed state still
    restores byte-for-byte (the cleaner must leave pinned files)."""
    tabs = {"t": t}
    c1 = t.latest_commit()
    before = _rows(t)
    call_procedure(
        spark, f"CALL create_savepoint(table => 't', commit_time => '{c1}')",
        tabs,
    )
    for v in (2, 3, 4):
        t.upsert(
            spark.createDataFrame(
                [(i, v, v * 100.0 + i) for i in range(6)],
                "id long, ver long, amt double",
            )
        )
    call_procedure(
        spark, "CALL run_clean(table => 't', retain_commits => 1)", tabs
    )
    call_procedure(
        spark,
        f"CALL rollback_to_savepoint(table => 't', instant_time => '{c1}')",
        tabs,
    )
    assert _rows(t) == before


# -- maintenance -------------------------------------------------------


def test_run_clustering_preserves_rows_and_sorts(spark, t):
    tabs = {"t": t}
    before = _rows(t)
    nfiles = len(t.current_files())
    out = call_procedure(
        spark,
        "CALL run_clustering(table => 't', order => 'amt',"
        " target_records_per_file => 100)",
        tabs,
    ).collect()[0]
    assert out.state == "completed" and out.commit == t.latest_commit()
    assert _rows(t) == before
    assert len(t.current_files()) < nfiles  # sized up into fewer files
    with pytest.raises(ValueError, match="zorder"):
        call_procedure(
            spark, "CALL run_clustering(table => 't', zorder => true)", tabs
        )


def test_run_compaction_mor(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "m"), key="id", precombine="ver",
        table_name="m", table_type="mor",
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(i, 1, float(i)) for i in range(4)],
            "id long, ver long, amt double",
        )
    )
    tabs = {"m": t}
    sched = call_procedure(
        spark, "CALL run_compaction(table => 'm', op => 'schedule')", tabs
    ).collect()[0]
    assert sched.should_compact is False  # no deltas yet
    t.upsert(spark.createDataFrame([(1, 2, 99.0)], "id long, ver long, amt double"))
    before = sorted(
        (r.id, r.amt) for r in t.snapshot().select("id", "amt").collect()
    )
    call_procedure(spark, "CALL run_compaction(table => 'm')", tabs)
    assert all(
        e.get("kind", "base") != "delta" for e in t.current_files()
    ), "compaction folds every delta into the base"
    assert sorted(
        (r.id, r.amt) for r in t.snapshot().select("id", "amt").collect()
    ) == before
    with pytest.raises(ValueError, match="run|schedule"):
        call_procedure(
            spark, "CALL run_compaction(table => 'm', op => 'now')", tabs
        )


def test_archive_commits(spark, t):
    tabs = {"t": t}
    out = call_procedure(
        spark, "CALL archive_commits(table => 't', keep_active => 1)", tabs
    ).collect()[0]
    # archivability needs a checkpoint horizon; with none, zero archived
    assert out.archived_commits == len(t._archived_manifests())


def test_execute_points_call_at_call_procedure(spark, t):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (
        sql_dml,
    )

    with pytest.raises(ValueError, match="call_procedure"):
        sql_dml.execute(spark, "CALL show_commits(table => 't')", {"t": t})


def test_show_archived_commits(spark, t):
    tabs = {"t": t}
    # build depth + a checkpoint horizon so archiving can fold commits
    for i in range(12):
        t.upsert(
            spark.createDataFrame(
                [(i % 3, 2 + i, 999.0 + i)], "id long, ver long, amt double"
            )
        )
    call_procedure(
        spark, "CALL archive_commits(table => 't', keep_active => 2)", tabs
    )
    archived = t._archived_manifests()
    if archived:  # archivability depends on the checkpoint cadence
        out = call_procedure(
            spark,
            "CALL show_archived_commits(table => 't', limit => 100)",
            tabs,
        ).collect()
        assert {r.commit for r in out} == set(archived)
        assert all(r.action for r in out)
    # active timeline rows never appear
    active = call_procedure(
        spark, "CALL show_commits(table => 't', limit => 100)", tabs
    )
    assert t.latest_commit() not in {
        r.commit
        for r in call_procedure(
            spark,
            "CALL show_archived_commits(table => 't', limit => 100)",
            tabs,
        ).collect()
    }
    assert active.count() >= 2


def test_commits_compare(spark, t, tmp_path):
    o = Table.create(
        spark, str(tmp_path / "o"), key="id", precombine="ver",
        table_name="o",
    )
    o.bulk_insert(
        spark.createDataFrame([(1, 1, 1.0)], "id long, ver long, amt double")
    )
    tabs = {"t": t, "o": o}
    r = call_procedure(
        spark, "CALL commits_compare(table => 't', other => 'o')", tabs
    ).collect()[0]
    assert r.source_commits == 1 and r.target_commits == 1
    assert "same commit depth" in r.message
    t.upsert(
        spark.createDataFrame([(0, 2, 5.0)], "id long, ver long, amt double")
    )
    r = call_procedure(
        spark, "CALL commits_compare(table => 't', other => 'o')", tabs
    ).collect()[0]
    assert r.source_commits == 2 and "ahead by 1" in r.message
    assert r.source_latest == t.latest_commit()
    r = call_procedure(
        spark, "CALL commits_compare(table => 'o', other => 't')", tabs
    ).collect()[0]
    assert "behind by 1" in r.message
    with pytest.raises(ValueError, match="other"):
        call_procedure(spark, "CALL commits_compare(table => 't')", tabs)
    with pytest.raises(ValueError, match="unknown CALL table"):
        call_procedure(
            spark,
            "CALL commits_compare(table => 't', other => 'zz')",
            tabs,
        )


def test_run_clustering_bucket_count_rejects_sizing_arg(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "bt"), key="id", precombine="ver",
        index_type="bucket", bucket_count=4,
    )
    t.bulk_insert(
        spark.createDataFrame([(1, 1)], "id long, ver long")
    )
    with pytest.raises(ValueError, match="own strategy"):
        call_procedure(
            spark,
            "CALL run_clustering(table => 'bt', bucket_count => 8, "
            "target_records_per_file => 1000)",
            {"bt": t},
        )


def test_show_rollbacks(spark, t):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_dml import (
        call_procedure,
    )

    tabs = {"t": t}
    c1 = t.latest_commit()
    assert (
        call_procedure(spark, "CALL show_rollbacks(table => 't')", tabs)
        .count()
        == 0
    )
    call_procedure(
        spark,
        f"CALL rollback_to_instant(table => 't', instant_time => '{c1}')",
        tabs,
    )
    rows = call_procedure(
        spark, "CALL show_rollbacks(table => 't')", tabs
    ).collect()
    assert len(rows) == 1 and rows[0]["action"] == "restore"


def test_call_shallow_clone_attaches_queryable_clone(spark, tmp_path):
    """r14: CALL shallow_clone adopts the source's live files and
    attaches the clone to the session — later statements query and
    write it independently of the source."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_session import (
        SqlSession,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    src = Table.create(
        spark, str(tmp_path / "s"), key="id", precombine="ver",
        table_name="s",
    )
    src.bulk_insert(
        spark.createDataFrame([(1, 1, "a"), (2, 1, "b")],
                              "id long, ver long, val string")
    )
    sess = SqlSession(spark, tables={"s": src})
    out = sess.sql(
        f"CALL shallow_clone(table => 's', location => "
        f"'{tmp_path / 'c'}')"
    ).collect()
    assert out[0]["clone_name"] == "s_clone"
    assert out[0]["n_adopted_files"] >= 1
    got = sess.sql("SELECT id, val FROM s_clone ORDER BY id").collect()
    assert [(r["id"], r["val"]) for r in got] == [(1, "a"), (2, "b")]
    # writes to the attached clone leave the source untouched
    sess.sql("UPDATE s_clone SET val = 'zz' WHERE id = 1")
    assert [
        r["val"] for r in sess.sql(
            "SELECT val FROM s_clone WHERE id = 1").collect()
    ] == ["zz"]
    assert [
        r["val"] for r in sess.sql(
            "SELECT val FROM s WHERE id = 1").collect()
    ] == ["a"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already an attached"):
        sess.sql(
            f"CALL shallow_clone(table => 's', location => "
            f"'{tmp_path / 'c2'}', clone_name => 's_clone')"
        )
