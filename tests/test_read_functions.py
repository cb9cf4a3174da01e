"""read_parquet / read_csv_auto / read_json_auto table functions at the SQL
surface (SURVEY §2.2a [P]; reference reach: full passthrough db/db.go:70)."""

from __future__ import annotations

import json
import os
import tempfile
import urllib.request

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_readfn_"))


@pytest.fixture(scope="module")
def pq_dir(spark):
    d = tempfile.mkdtemp(prefix="readfn_pq_")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id INT, g STRING, v DOUBLE"
    ).write.mode("overwrite").parquet(d + "/data.parquet")
    return d


def test_read_parquet_basic(engine, pq_dir):
    rows = engine.query_df(
        f"SELECT g, count(*) AS n FROM read_parquet('{pq_dir}/data.parquet') "
        "GROUP BY g ORDER BY g"
    ).collect()
    assert [(r.g, r.n) for r in rows] == [("a", 2), ("b", 1)]


def test_read_parquet_glob(engine, pq_dir):
    rows = engine.query_df(
        f"SELECT count(*) AS n FROM read_parquet('{pq_dir}/*.parquet')"
    ).collect()
    assert rows[0].n == 3


def test_parquet_scan_alias_and_join(engine, pq_dir):
    """parquet_scan alias; two read functions in one statement."""
    rows = engine.query_df(
        f"SELECT a.id FROM parquet_scan('{pq_dir}/data.parquet') a "
        f"JOIN read_parquet('{pq_dir}/data.parquet') b ON a.id = b.id "
        "ORDER BY a.id"
    ).collect()
    assert [r.id for r in rows] == [1, 2, 3]


def test_read_parquet_filter_pushdown(engine, pq_dir):
    df = engine.query_df(
        f"SELECT id FROM read_parquet('{pq_dir}/data.parquet') WHERE id = 2"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,2)]" in plan


def test_read_csv_auto_options(engine):
    d = tempfile.mkdtemp(prefix="readfn_csv_")
    with open(os.path.join(d, "t.csv"), "w") as f:
        f.write("id|name\n1|x\n2|y\n")
    rows = engine.query_df(
        f"SELECT id, name FROM read_csv_auto('{d}/t.csv', delim='|', header=true) "
        "ORDER BY id"
    ).collect()
    assert [(r.id, r.name) for r in rows] == [(1, "x"), (2, "y")]


def test_read_json_auto(engine):
    d = tempfile.mkdtemp(prefix="readfn_json_")
    with open(os.path.join(d, "t.json"), "w") as f:
        f.write('{"id": 1, "v": "p"}\n{"id": 2, "v": "q"}\n')
    rows = engine.query_df(
        f"SELECT id, v FROM read_json_auto('{d}/t.json') ORDER BY id"
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(1, "p"), (2, "q")]


def test_read_fn_inside_string_literal_untouched(engine):
    rows = engine.query_df("SELECT 'read_parquet(''x'')' AS lit").collect()
    assert rows[0].lit == "read_parquet('x')"


def test_read_parquet_unknown_option_raises(engine, pq_dir):
    from duckdb_service_spark.service.dialect import UnsupportedDialect

    with pytest.raises((UnsupportedDialect, ValueError)):
        engine.query_df(
            f"SELECT * FROM read_parquet('{pq_dir}/data.parquet', bogus=1)"
        )


def test_read_parquet_over_http(engine, pq_dir):
    from duckdb_service_spark.service.http_server import EngineHTTPServer

    srv = EngineHTTPServer(engine).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/db/query",
            data=json.dumps(
                {"sql": f"SELECT count(*) AS n FROM read_parquet('{pq_dir}/data.parquet')"}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["result"]["values"] == [[3]]
    finally:
        srv.stop()


def test_r08_file_tvfs_match_duckdb(spark, tmp_path):
    """read_text / read_blob / glob — DuckDB's file TVFs over Spark's
    binaryFile source (distributed scan; URI scheme stripped to match
    DuckDB's plain paths)."""
    import duckdb

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, str(tmp_path / "wh_filetvf"))
    dq = duckdb.connect().execute
    (tmp_path / "a.txt").write_text("hello world\n")
    (tmp_path / "b.txt").write_bytes(b"\x00\x01binary")
    pat = str(tmp_path / "*.txt")
    for sql in [
        f"SELECT filename, content, size FROM read_text('{pat}')"
        " ORDER BY filename",
        f"SELECT filename, content, size FROM read_blob('{pat}')"
        " ORDER BY filename",
        f"SELECT * FROM glob('{pat}')",
        f"SELECT upper(content) AS u, size * 2 AS s2 FROM"
        f" read_text('{tmp_path / 'a.txt'}')",
    ]:
        got = sorted(tuple(r) for r in eng.query_df(sql).collect())
        want = sorted(tuple(r) for r in dq(sql).fetchall())
        assert got == want, (sql, got, want)


def test_r08_parquet_introspection_tvfs(spark, tmp_path, sf_dir):
    """parquet_schema / parquet_file_metadata / parquet_metadata — footer
    introspection matching DuckDB on the engine-comparable columns."""
    import duckdb

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, str(tmp_path / "wh_pqmeta"))
    dq = duckdb.connect().execute
    p = f"{sf_dir}/region.parquet"
    for sql in [
        f"SELECT file_name, num_rows, num_row_groups"
        f" FROM parquet_file_metadata('{p}')",
        f"SELECT name, type, converted_type FROM parquet_schema('{p}')"
        " ORDER BY name",
        f"SELECT row_group_id, column_id, path_in_schema, num_values,"
        f" stats_min_value, stats_max_value FROM parquet_metadata('{p}')"
        " ORDER BY column_id",
    ]:
        got = sorted(tuple(r) for r in eng.query_df(sql).collect())
        want = sorted(tuple(r) for r in dq(sql).fetchall())
        assert got == want, (sql, got, want)
