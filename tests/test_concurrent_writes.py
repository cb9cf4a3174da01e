"""Adversarial concurrency test for the single-writer claim (VERDICT r05
next #8): N threads fire INSERTs and UPDATEs at the HTTP layer
simultaneously; the write lock (http_server.py) must serialize them so no
insert is lost, no update is partially applied, and PRIMARY KEY integrity
holds. Mirrors the reference's serialization point — there the Raft log
orders writes (store/store.go:242-250); here a process lock does."""

from __future__ import annotations

import json
import tempfile
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest


@pytest.fixture(scope="module")
def engine(spark):
    from duckdb_service_spark.service.executor import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="warehouse_conc_"))


@pytest.fixture(scope="module")
def server(engine):
    from duckdb_service_spark.service.http_server import EngineHTTPServer

    srv = EngineHTTPServer(engine).start()
    yield srv
    srv.stop()


def _post(server, path: str, sql: str) -> dict:
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _query(server, sql: str):
    return _post(server, "/db/query", sql)["result"]


def test_parallel_inserts_none_lost(server):
    _post(server, "/db/execute", "CREATE TABLE conc_ins (id INTEGER PRIMARY KEY, src INTEGER)")
    N, PER = 8, 10

    def worker(w: int):
        for i in range(PER):
            r = _post(
                server,
                "/db/execute",
                f"INSERT INTO conc_ins VALUES ({w * PER + i}, {w})",
            )
            assert "error" not in r, r
        return w

    with ThreadPoolExecutor(N) as ex:
        assert sorted(ex.map(worker, range(N))) == list(range(N))

    res = _query(server, "SELECT count(*) AS n, count(DISTINCT id) AS d FROM conc_ins")
    assert res["values"][0] == [N * PER, N * PER]  # none lost, PK unique
    per_src = _query(
        server, "SELECT src, count(*) AS n FROM conc_ins GROUP BY src ORDER BY src"
    )
    assert per_src["values"] == [[w, PER] for w in range(N)]


def test_parallel_updates_serialize(server):
    _post(server, "/db/execute", "CREATE TABLE conc_upd (id INTEGER PRIMARY KEY, v INTEGER)")
    # DuckDB's FROM range(n) exposes a column named `range` (r08: the
    # engine previously fell through to Spark's native range TVF whose
    # column is `id` — a silent divergence fixed by rewrite_series_tvf)
    _post(server, "/db/execute", "INSERT INTO conc_upd SELECT range, 0 FROM range(20)")
    N, ROUNDS = 8, 5

    def worker(w: int):
        for _ in range(ROUNDS):
            r = _post(server, "/db/execute", "UPDATE conc_upd SET v = v + 1")
            assert "error" not in r, r
            assert r["result"]["rows_affected"] == 20
        return w

    with ThreadPoolExecutor(N) as ex:
        list(ex.map(worker, range(N)))

    # every UPDATE applied atomically to all 20 rows: each row saw all
    # N*ROUNDS increments, none torn
    res = _query(server, "SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM conc_upd")
    assert res["values"][0] == [N * ROUNDS, N * ROUNDS, 20]


def test_parallel_mixed_inserts_updates_pk_conflicts(server):
    _post(server, "/db/execute", "CREATE TABLE conc_mix (id INTEGER PRIMARY KEY, v INTEGER)")
    N = 8

    def worker(w: int):
        ok_ins = dup = 0
        for i in range(10):
            # every worker races to insert the SAME key space 0..9
            r = _post(server, "/db/execute", f"INSERT INTO conc_mix VALUES ({i}, {w})")
            if "error" in r:
                assert "duplicate" in r["error"].lower() or "key" in r["error"].lower()
                dup += 1
            else:
                ok_ins += 1
            r = _post(server, "/db/execute", f"UPDATE conc_mix SET v = v + 100 WHERE id = {i}")
            assert "error" not in r
        return ok_ins, dup

    with ThreadPoolExecutor(N) as ex:
        results = list(ex.map(worker, range(N)))

    # exactly one insert won per key; every other attempt got the PK error
    assert sum(ok for ok, _ in results) == 10
    assert sum(d for _, d in results) == (N * 10) - 10
    res = _query(server, "SELECT count(*) AS n, count(DISTINCT id) AS d FROM conc_mix")
    assert res["values"][0] == [10, 10]
