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


# -- time-travel SQL syntax ---------------------------------------------


@pytest.fixture()
def versioned(spark, tmp_path):
    """Engine table with commit 1 = ids 0..9 ver 1, commit 2 = ids 0..4
    rewritten at ver 2 with amt += 100."""
    t = Table.create(
        spark, str(tmp_path / "v"), key="ok", precombine="over",
        table_name="v",
    )
    t.bulk_insert(
        spark.createDataFrame(
            [(i, 1, float(i)) for i in range(10)],
            "ok long, over long, amt double",
        )
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 2, float(i) + 100) for i in range(5)],
            "ok long, over long, amt double",
        )
    )
    return t


def test_sql_version_as_of(spark, versioned):
    t = versioned
    tabs = {"eng_v": t}
    old = sql_over(
        spark, tabs, "SELECT sum(amt) AS s, count(*) AS n "
        "FROM eng_v VERSION AS OF 1"
    ).collect()[0]
    assert (old.s, old.n) == (45.0, 10)
    # quoted full commit id form; latest without the clause
    c1 = t.commits()[0]
    old2 = sql_over(
        spark, tabs,
        f"SELECT sum(amt) AS s FROM eng_v VERSION AS OF '{c1}'",
    ).collect()[0]
    assert old2.s == 45.0
    new = sql_over(spark, tabs, "SELECT sum(amt) AS s FROM eng_v").collect()[0]
    assert new.s == 45.0 + 5 * 100


def test_sql_timestamp_as_of(spark, versioned):
    t = versioned
    c1 = t.commits()[0]
    ts = t._manifest(c1)["ts"]
    got = sql_over(
        spark, {"eng_v": t},
        f"SELECT count(*) AS n, sum(amt) AS s "
        f"FROM eng_v TIMESTAMP AS OF '{ts}'",
    ).collect()[0]
    assert (got.n, got.s) == (10, 45.0)
    # predating the first commit refuses (Delta semantics), never
    # falls through to latest
    with pytest.raises(ValueError, match="first commit"):
        sql_over(
            spark, {"eng_v": t},
            "SELECT 1 AS x FROM eng_v TIMESTAMP AS OF '1999-01-01'",
        )


def test_time_travel_binds_whole_query_and_conflicts_raise(spark, versioned):
    t = versioned
    tabs = {"eng_v": t}
    # the as-of binding applies to qualifier references of the same name
    got = sql_over(
        spark, tabs,
        "SELECT max(eng_v.amt) AS m FROM eng_v VERSION AS OF 1",
    ).collect()[0]
    assert got.m == 9.0
    # two agreeing clauses are fine (self-join of the same version)
    rows = sql_over(
        spark, tabs,
        "SELECT count(*) AS n FROM eng_v VERSION AS OF 1 a "
        "JOIN eng_v VERSION AS OF 1 b ON a.ok = b.ok",
    ).collect()[0]
    assert rows.n == 10
    with pytest.raises(ValueError, match="conflicting"):
        sql_over(
            spark, tabs,
            "SELECT * FROM eng_v VERSION AS OF 1 a "
            "JOIN eng_v VERSION AS OF 2 b ON a.ok = b.ok",
        )
    with pytest.raises(ValueError, match="no commit"):
        sql_over(spark, tabs, "SELECT * FROM eng_v VERSION AS OF 99")


def test_time_travel_lexical_guards(spark, versioned):
    t = versioned
    tabs = {"eng_v": t}
    # inside a string literal → untouched (still aggregates the LATEST)
    got = sql_over(
        spark, tabs,
        "SELECT sum(amt) AS s, max('eng_v VERSION AS OF 1') AS lit FROM eng_v",
    ).collect()[0]
    assert got.s == 45.0 + 500 and got.lit == "eng_v VERSION AS OF 1"
    # a LONGER identifier ending in the view name must not rewrite:
    # the unknown relation surfaces as Spark's own error, not a silent
    # time travel of eng_v
    import pyspark.sql.utils  # noqa: F401

    with pytest.raises(Exception, match="xeng_v|TABLE_OR_VIEW_NOT_FOUND"):
        sql_over(spark, tabs, "SELECT * FROM xeng_v VERSION AS OF 1")


def test_time_travel_disables_auto_prune_for_that_view(spark, versioned):
    """A time-traveled view reads its full as-of file set: the auto
    extractor's schema attribution ran against the CURRENT schema, so
    it must not prune an as-of binding (evolution could have renamed
    the column between the two states). Values must still be exact."""
    t = versioned
    rows = sql_over(
        spark, {"eng_v": t},
        "SELECT ok, amt FROM eng_v VERSION AS OF 1 WHERE ok >= 8",
    ).collect()
    assert sorted((r.ok, r.amt) for r in rows) == [(8, 8.0), (9, 9.0)]


def test_attach_as_of_composes_with_where(spark, versioned):
    t = versioned
    c1 = t.commits()[0]
    attach(
        spark, {"eng_v": t}, where={"eng_v": "ok >= 8"}, as_of={"eng_v": c1}
    )
    got = spark.sql("SELECT sum(amt) AS s FROM eng_v").collect()[0]
    assert got.s == 17.0
    with pytest.raises(ValueError, match="as_of= binds snapshot"):
        attach(
            spark, {"eng_v": t}, query_type="incremental", begin="0",
            as_of={"eng_v": c1},
        )


# -- table_changes() TVF --------------------------------------------------


@pytest.fixture()
def three_commit_table(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "tc"), key="k", precombine="v", table_name="tc"
    )
    c1 = t.upsert(
        spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "k int, v int, s string")
    )
    c2 = t.upsert(
        spark.createDataFrame([(2, 2, "B"), (3, 1, "c")], "k int, v int, s string")
    )
    c3 = t.upsert(spark.createDataFrame([(4, 1, "d")], "k int, v int, s string"))
    return t, c1, c2, c3


def test_table_changes_window_matches_incremental(spark, three_commit_table):
    """begin-exclusive / end-inclusive: the TVF result equals
    Table.incremental over the same (begin, end] window."""
    t, c1, c2, _ = three_commit_table
    got = sorted(
        (r.k, r.s)
        for r in sql_over(
            spark,
            {"tc": t},
            f"SELECT k, s FROM table_changes(tc, 'latest_state', '{c1}', '{c2}')",
        ).collect()
    )
    want = sorted((r.k, r.s) for r in t.incremental(c1, c2).collect())
    assert got == want == [(2, "B"), (3, "c")]


def test_table_changes_numeric_earliest_and_quoted_forms(
    spark, three_commit_table
):
    t, c1, _, _ = three_commit_table
    # bare commit NUMBER resolves via the VERSION AS OF codec
    got = sorted(
        r.k
        for r in sql_over(
            spark,
            {"tc": t},
            "SELECT k FROM table_changes(tc, 'latest_state', '2')",
        ).collect()
    )
    assert got == [4]
    # quoted view name (Hudi's TVF form) + 'earliest' = full history
    n = (
        sql_over(
            spark,
            {"tc": t},
            "SELECT count(*) AS n FROM table_changes('tc', 'latest_state', 'earliest')",
        )
        .collect()[0]
        .n
    )
    assert n == 4


def test_table_changes_cdc_mode(spark, three_commit_table):
    t, c1, c2, _ = three_commit_table
    rows = sorted(
        (r.k, r._change_type)
        for r in sql_over(
            spark,
            {"tc": t},
            f"SELECT k, _change_type FROM table_changes(tc, 'cdc', '{c1}', '{c2}')",
        ).collect()
    )
    assert rows == [(2, "update"), (3, "insert")]


def test_table_changes_joins_with_live_snapshot(spark, three_commit_table):
    """The TVF binds its own view; the ORIGINAL view stays live in the
    same query, so changes join against the current snapshot."""
    t, _, c2, _ = three_commit_table
    rows = sorted(
        (r.k, r.cur)
        for r in sql_over(
            spark,
            {"tc": t},
            f"SELECT c.k, tc.s AS cur FROM "
            f"table_changes(tc, 'latest_state', '{c2}') c "
            f"JOIN tc ON tc.k = c.k",
        ).collect()
    )
    assert rows == [(4, "d")]


def test_table_changes_inside_string_literal_untouched(
    spark, three_commit_table
):
    t, _, _, _ = three_commit_table
    lit = (
        sql_over(
            spark,
            {"tc": t},
            "SELECT 'table_changes(tc, ''cdc'', ''1'')' AS lit",
        )
        .collect()[0]
        .lit
    )
    assert lit == "table_changes(tc, 'cdc', '1')"


def test_table_changes_rejections(spark, three_commit_table):
    t, c1, _, _ = three_commit_table
    with pytest.raises(ValueError, match="mode must be"):
        sql_over(
            spark, {"tc": t},
            f"SELECT * FROM table_changes(tc, 'bogus', '{c1}')",
        )
    with pytest.raises(ValueError, match="no commit"):
        sql_over(
            spark, {"tc": t},
            "SELECT * FROM table_changes(tc, 'latest_state', '99')",
        )
    with pytest.raises(ValueError, match="needs a begin commit"):
        sql_over(
            spark, {"tc": t},
            "SELECT * FROM table_changes(tc, 'latest_state')",
        )


def test_table_changes_through_sql_session_quoted_name(
    spark, three_commit_table
):
    """SqlSession's reference scan blanks quoted strings — the TVF
    pre-scan must still bind a table named only inside the call."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sql_session import (
        SqlSession,
    )

    t, c1, _, _ = three_commit_table
    sess = SqlSession(spark, tables={"tc": t})
    n = (
        sess.sql(
            f"SELECT count(*) AS n FROM table_changes('tc', 'latest_state', '{c1}')"
        )
        .collect()[0]
        .n
    )
    assert n == 3


def test_auto_where_prunes_single_reference_cte_query(spark, two_tables):
    """r8 bailed on ANY WITH query; the narrow relaxation prunes when
    the CTE list parses strictly, no CTE shadows an attached view, and
    the view is referenced only in the one top-level FROM."""
    o, c = two_tables
    tabs = {"eng_o": o, "eng_c": c}
    q = (
        "WITH lim AS (SELECT 1 AS one) "
        "SELECT a.ok FROM eng_o a, lim WHERE a.ok >= 30 AND a.ok < 40 "
        "ORDER BY a.ok"
    )
    assert _auto_where(q, tabs) == {"eng_o": "ok >= 30 AND ok < 40"}
    auto = sql_over(spark, {"eng_o": o.path, "eng_c": c.path}, q).collect()
    pruned_files = len(spark.table("eng_o").inputFiles())
    assert 0 < pruned_files < len(o.snapshot().inputFiles())
    attach(spark, {"eng_o": o.path, "eng_c": c.path})
    assert auto == spark.sql(q).collect()


def test_auto_where_cte_body_reading_view_still_bails(spark, two_tables):
    """A view read INSIDE a CTE body must keep its full binding — the
    CTE's aggregate would otherwise see the pruned input (the same
    failure mode as the global_max scalar-subquery regression)."""
    o, c = two_tables
    tabs = {"eng_o": o.path, "eng_c": c.path}
    q = (
        "WITH x AS (SELECT max(ok) AS m FROM eng_o) "
        "SELECT a.ok, x.m FROM eng_o a, x WHERE a.ok <= 3"
    )
    assert _auto_where(q, {"eng_o": o, "eng_c": c}) == {}
    rows = sql_over(spark, tabs, q).collect()
    assert rows and all(r.m == 99 for r in rows)


def test_auto_where_cte_fail_closed_shapes(spark, two_tables):
    o, c = two_tables
    tabs = {"eng_o": o, "eng_c": c}
    # CTE shadowing an attached view name: the main FROM reads the CTE
    assert _auto_where(
        "WITH eng_o AS (SELECT 5 AS ok) SELECT * FROM eng_o WHERE ok = 5",
        tabs,
    ) == {}
    # recursive CTEs stay out
    assert _auto_where(
        "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL "
        "SELECT n + 1 FROM r WHERE n < 3) "
        "SELECT a.ok FROM eng_o a, r WHERE a.ok = 5",
        tabs,
    ) == {}
    # unparseable CTE list (no AS-parens) -> bail
    assert _auto_where(
        "WITH x SELECT * FROM eng_o WHERE ok = 5", tabs
    ) == {}


def test_auto_where_expression_index_single_relation(spark, tmp_path):
    """A single-relation SQL string whose conjunct text matches a
    registered expression index binds the view manifest-pruned; the
    same conjunct in a multi-relation query extracts nothing."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        TableServices,
    )
    from pyspark.sql import functions as F

    orders = spark.read.parquet(
        "/root/testdata/sf0.01/orders.parquet"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    t = Table.create(
        spark, str(tmp_path / "exiq"), key="o_orderkey",
        precombine="o_orderdate", table_name="exiq",
        max_records_per_file=2000,
    )
    t.bulk_insert(orders.repartitionByRange(8, F.col("o_orderdate")))
    TableServices(t).build_expression_index("year(o_orderdate)")
    q = (
        "SELECT count(*) AS n FROM eo "
        "WHERE year(o_orderdate) = 1996 AND o_totalprice > 100"
    )
    got = _auto_where(q, {"eo": t})
    assert "year(o_orderdate) = 1996" in got["eo"]
    n = sql_over(spark, {"eo": t}, q).collect()[0].n
    pruned = len(spark.table("eo").inputFiles())
    assert pruned < len(t.snapshot().inputFiles())
    attach(spark, {"eo": t})
    assert n == spark.sql(q).collect()[0].n
    # multi-relation: the expression conjunct is NOT attributed
    t2 = Table.create(
        spark, str(tmp_path / "d2"), key="k", precombine="v", table_name="d2"
    )
    t2.bulk_insert(spark.createDataFrame([(1, 1)], "k long, v long"))
    got2 = _auto_where(
        "SELECT count(*) AS n FROM eo, d2 WHERE year(o_orderdate) = 1996",
        {"eo": t, "d2": t2},
    )
    assert "eo" not in got2
    # an unregistered expression extracts nothing even single-relation
    got3 = _auto_where(
        "SELECT count(*) AS n FROM eo WHERE month(o_orderdate) = 6",
        {"eo": t},
    )
    assert got3 == {}
