"""SQL-over-views catalog surface: explicit and AUTOMATIC manifest
pruning (the read-side scale path for the reference's primary
interface). Pins the fail-closed attribution rules of _auto_where —
a wrong attribution would silently drop rows, so every ambiguous shape
must extract nothing."""

from __future__ import annotations

import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.catalog_api import (
    _auto_where,
    attach,
    sql_over,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
)


@pytest.fixture()
def two_tables(spark, tmp_path):
    """orders-ish (key ok) and customers-ish (key ck) engine tables,
    each range-laid-out across multiple files."""
    o = Table.create(
        spark, str(tmp_path / "o"), key="ok", precombine="over",
        table_name="o", max_records_per_file=10,
    )
    o.bulk_insert(
        spark.createDataFrame(
            [(i, 1, i % 5, f"s{i % 3}") for i in range(100)],
            "ok long, over long, ck long, status string",
        ).repartitionByRange(4, "ok")
    )
    c = Table.create(
        spark, str(tmp_path / "c"), key="ck", precombine="cver",
        table_name="c", max_records_per_file=2,
    )
    c.bulk_insert(
        spark.createDataFrame(
            [(i, 1, f"name{i}") for i in range(5)],
            "ck long, cver long, cname string",
        ).repartitionByRange(2, "ck")
    )
    return o, c


def _owners(spark, two_tables):
    o, c = two_tables
    return {"eng_o": o, "eng_c": c}


def test_auto_where_attribution_rules(spark, two_tables):
    o, c = two_tables
    tabs = {"eng_o": o, "eng_c": c}
    # qualified via alias and bare unambiguous column both attribute
    got = _auto_where(
        "SELECT * FROM eng_o a JOIN eng_c b ON a.ck = b.ck "
        "WHERE a.ok >= 10 AND a.ok <= 20 AND cname = 'name3'",
        tabs,
    )
    assert got == {"eng_o": "ok >= 10 AND ok <= 20", "eng_c": "cname = 'name3'"}
    # ck exists in BOTH schemas -> bare ref is ambiguous -> dropped
    assert _auto_where(
        "SELECT * FROM eng_o a JOIN eng_c b ON a.ck = b.ck WHERE ck = 3",
        tabs,
    ) == {}
    # top-level OR disables everything
    assert _auto_where(
        "SELECT * FROM eng_o WHERE ok = 1 OR ok = 2", tabs
    ) == {}
    # parenthesized OR: that conjunct is skipped, the rest extracts
    assert _auto_where(
        "SELECT * FROM eng_o WHERE (ok = 1 OR ok = 2) AND status = 's1'",
        tabs,
    ) == {"eng_o": "status = 's1'"}
    # cross-relation comparison must NOT be extracted (would not
    # resolve de-qualified on the single view)
    assert _auto_where(
        "SELECT * FROM eng_o a JOIN eng_c b ON a.ck = b.ck "
        "WHERE a.ok = b.ck",
        tabs,
    ) == {}
    # expression right-hand sides are not literals -> skipped
    assert _auto_where(
        "SELECT * FROM eng_o a WHERE a.ok = a.ck + 1", tabs
    ) == {}
    # self-join: per-view pre-filter impossible -> nothing extracts
    assert _auto_where(
        "SELECT * FROM eng_o a JOIN eng_o b ON a.ok = b.ck "
        "WHERE a.ok = 5 AND b.ok = 9",
        tabs,
    ) == {}
    # subquery in FROM -> fail closed
    assert _auto_where(
        "SELECT * FROM (SELECT * FROM eng_o) x WHERE ok = 5", tabs
    ) == {}
    # unattached relation in FROM: bare refs unsafe, qualified refs to
    # attached views still extract
    assert _auto_where(
        "SELECT * FROM eng_o a JOIN other_view v ON a.ck = v.k "
        "WHERE a.ok = 5 AND status = 's1'",
        tabs,
    ) == {"eng_o": "ok = 5"}
    # string literal containing "<qual>." must survive verbatim
    assert _auto_where(
        "SELECT * FROM eng_o a WHERE a.status = 'a.ok'", tabs
    ) == {"eng_o": "status = 'a.ok'"}


def test_sql_over_auto_prunes_and_matches_unpruned(spark, two_tables):
    o, c = two_tables
    tabs = {"eng_o": o.path, "eng_c": c.path}
    q = (
        "SELECT a.ok, b.cname FROM eng_o a JOIN eng_c b ON a.ck = b.ck "
        "WHERE a.ok >= 30 AND a.ok < 40 ORDER BY a.ok"
    )
    auto = sql_over(spark, tabs, q).collect()
    # the bound view planned fewer files than the full snapshot
    pruned_files = len(spark.table("eng_o").inputFiles())
    assert 0 < pruned_files < len(o.snapshot().inputFiles())
    # and the result equals the explicitly-unpruned run
    attach(spark, tabs)  # rebind full snapshots
    plain = spark.sql(q).collect()
    assert auto == plain


def test_sql_over_explicit_where_overrides_auto(spark, two_tables):
    o, c = two_tables
    tabs = {"eng_o": o.path, "eng_c": c.path}
    df = sql_over(
        spark,
        tabs,
        "SELECT count(*) AS n FROM eng_o",
        where={"eng_o": "ok >= 90"},
    )
    assert df.collect()[0].n == 10


def test_sql_over_outer_join_semantics_preserved(spark, two_tables):
    """WHERE conjuncts on the null-extended side of a LEFT JOIN: the
    pre-filter drops right-side rows, the join null-extends, and the
    outer WHERE removes those rows — same final result as unpruned."""
    o, c = two_tables
    tabs = {"eng_o": o.path, "eng_c": c.path}
    q = (
        "SELECT a.ok, b.cname FROM eng_o a LEFT JOIN eng_c b "
        "ON a.ck = b.ck WHERE b.cname = 'name2' ORDER BY a.ok"
    )
    auto = sql_over(spark, tabs, q).collect()
    attach(spark, tabs)
    assert auto == spark.sql(q).collect()


def test_auto_where_ignores_view_reread_in_subquery(spark, two_tables):
    """Code-review regression: a scalar/IN subquery that reads the
    attached view BY NAME must disable auto-pruning for that view —
    pruning the binding would filter the subquery's input too
    (global_max came back 3 instead of the true max)."""
    o, c = two_tables
    tabs = {"eng_o": o.path, "eng_c": c.path}
    q = (
        "SELECT a.ok, (SELECT max(ok) FROM eng_o) AS global_max "
        "FROM eng_o a WHERE a.ok <= 3"
    )
    rows = sql_over(spark, tabs, q).collect()
    assert rows and all(r.global_max == 99 for r in rows)
    # CTE queries disable extraction entirely (the CTE body is
    # invisible to the top-level scan and may shadow/read the view)
    got = _auto_where(
        "WITH x AS (SELECT * FROM eng_o) SELECT * FROM x WHERE ok = 5",
        {"eng_o": o, "eng_c": c},
    )
    assert got == {}


def test_filters_from_predicate_double_quoted_literal(spark, two_tables):
    """Code-review regression: Spark treats double quotes as string
    literals by default, so ' AND col = 5 AND ' INSIDE \"...\" must not
    fabricate a prune filter (rows with that literal value would
    vanish)."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        _filters_from_predicate,
    )

    o, _c = two_tables
    schema = o._schema()
    assert _filters_from_predicate(
        'status = "a AND ok = 5 AND b"', schema
    ) == {}
    # and end-to-end: read_where over such a predicate scans unpruned
    # and returns exactly the snapshot filter result
    pred = "status = \"s1 AND ok = 5 AND x\" OR ok = 7"
    import pyspark.sql.functions as F

    assert sorted(r.ok for r in o.read_where(pred).collect()) == sorted(
        r.ok for r in o.snapshot().where(pred).collect()
    )


def test_attach_where_conflicts_with_query_type(spark, two_tables):
    """Code-review regression: where= is a snapshot read — combining it
    with an incremental/CDC query_type must raise, not silently widen
    the window to filtered full history."""
    o, _c = two_tables
    with pytest.raises(ValueError, match="conflicting"):
        attach(
            spark, {"v": o.path}, query_type="incremental",
            begin="0", where={"v": "ok > 5"},
        )
