"""Round-7: TIMESTAMP_S / TIMESTAMP_MS / TIMESTAMP_NS surface (VERDICT r06
task 6, SURVEY §1.3) — cast rounding differential vs DuckDB, the declared
ns-truncation divergence, catalog/serializer type mapping, and the to_*()
interval constructors."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from duckdb_service_spark.service.dialect import translate


def _one(spark, sql):
    return spark.sql(translate(sql)).collect()[0][0]


@pytest.mark.parametrize(
    "expr",
    [
        "CAST(TIMESTAMP '2020-01-01 00:00:00.5' AS TIMESTAMP_S)",
        "CAST(TIMESTAMP '2020-01-01 00:00:01.5' AS TIMESTAMP_S)",
        "CAST(TIMESTAMP '1969-12-31 23:59:59.5' AS TIMESTAMP_S)",
        "CAST(TIMESTAMP '2020-01-01 00:00:00.0005' AS TIMESTAMP_MS)",
        "CAST(TIMESTAMP '2020-01-01 00:00:00.999999' AS TIMESTAMP_MS)",
        "TIMESTAMP '2020-03-05 01:02:03.0015'::TIMESTAMP_MS",
        "(TIMESTAMP '2020-03-05 01:02:03.7')::TIMESTAMP_S",
        "CAST(TIMESTAMP '2020-01-01 12:00:00.123456' AS TIMESTAMP_NS)",
        "TIMESTAMP_NS '2021-06-01 10:30:00.123456'",
        "TIMESTAMP_S '2021-06-01 10:30:00'",
        "TIMESTAMP_MS '2021-06-01 10:30:00.123'",
        "try_cast(TIMESTAMP '2020-01-01 00:00:02.9' AS TIMESTAMP_S)",
    ],
)
def test_ts_precision_cast_matches_duckdb(spark, expr):
    want = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    got = _one(spark, f"SELECT {expr} AS v")
    assert got == want


def test_ns_truncation_declared_divergence(spark):
    """Sub-µs digits truncate to Spark's µs storage — the documented SURVEY
    §1.3 / COVERAGE.md divergence for genuine ns SOURCES (ns parquet).
    Measured: DuckDB's own TIMESTAMP_NS literal parse also keeps only µs
    (epoch_ns → …456000), so the literal surface has NO divergence; pin
    both engines at the µs value."""
    expr = "TIMESTAMP_NS '2021-06-01 10:30:00.123456789'"
    duck = duckdb.sql(f"SELECT epoch_ns({expr})").fetchone()[0]
    assert duck == 1622543400123456000  # DuckDB literal parse: µs too
    got = _one(spark, f"SELECT {expr} AS v")
    assert got == datetime.datetime(2021, 6, 1, 10, 30, 0, 123456)  # µs


@pytest.mark.parametrize(
    "expr",
    [
        "TIMESTAMP '2024-01-01 00:00:00' + to_days(3)",
        "TIMESTAMP '2024-01-01 00:00:00' + to_hours(25)",
        "TIMESTAMP '2024-01-01 00:00:00' + to_minutes(90)",
        "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(3601)",
        "TIMESTAMP '2024-01-01 00:00:00' + to_milliseconds(1500)",
        "TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(123456)",
        "CAST(DATE '2024-01-31' + to_months(1) AS DATE)",
    ],
)
def test_interval_builders_match_duckdb(spark, expr):
    want = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    got = _one(spark, f"SELECT {expr} AS v")
    assert got == want


def test_catalog_type_and_serializer_name(spark):
    import tempfile

    from duckdb_service_spark.service.executor import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="wh_tsprec_"))
    eng.execute("CREATE TABLE ts_prec (a TIMESTAMP_NS, b TIMESTAMP_S, c TIMESTAMP_MS)")
    eng.execute("INSERT INTO ts_prec VALUES (TIMESTAMP '2024-01-01 00:00:00.123456', TIMESTAMP '2024-01-01 00:00:01', TIMESTAMP '2024-01-01 00:00:00.123')")
    from duckdb_service_spark.service.serializer import query_result

    out = query_result(eng.query_df("SELECT * FROM ts_prec"))
    assert out["columns"] == ["a", "b", "c"]
    assert out["types"] == ["TIMESTAMP_NS", "TIMESTAMP_S", "TIMESTAMP_MS"]
    assert out["values"][0][0].startswith("2024-01-01 00:00:00.123456")


def test_ns_parquet_source_truncation_end_to_end(spark, tmp_path):
    """A REAL parquet file with physical TIMESTAMP(NANOS) (r07 verdict
    missing #3: the declared truncation divergence had no fixture actually
    exercising the ns read path). pyarrow writes timeUnit=nanoseconds;
    Spark reads it as long under nanosAsLong and the engine's events read
    path truncates ns -> µs by integer division (tables.py:46-52).
    Measured here: DuckDB's OWN parquet reader does the identical
    truncation (epoch 1622543400999999999 ns -> ...999999000 µs), so the
    engine matches DuckDB exactly on ns sources — the SURVEY §1.3
    'divergence' is only vs a hypothetical ns-preserving reader, not vs
    the reference."""
    import duckdb as _duck
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_service_spark.sources import load_tables

    sf_dir = str(tmp_path)
    ns_vals = [1622543400123456789, 1622543400999999999, 5]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array(ns_vals, type=pa.timestamp("ns")),
            "user_id": pa.array([10, 20, 30], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.5, 2.5, 3.5]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    path = f"{sf_dir}/events.parquet"
    pq.write_table(tbl, path, version="2.6")
    # physical type really is NANOS (not µs silently)
    meta = pq.read_metadata(path).schema
    assert "nanoseconds" in str(meta), str(meta)

    t = load_tables(spark, sf_dir)
    got = {
        r["event_id"]: r["ts"]
        for r in t["events"].select("event_id", "ts").collect()
    }
    want = {
        eid: ts
        for eid, ts in _duck.sql(
            f"SELECT event_id, ts FROM read_parquet('{path}')"
        ).fetchall()
    }
    assert got == want, (got, want)
    # the µs value is the ns value floor-divided by 1000
    assert got[2] == datetime.datetime(2021, 6, 1, 10, 30, 0, 999999)
    assert got[3] == datetime.datetime(1970, 1, 1, 0, 0, 0, 0)

    # serializer surface: NTZ timestamps serialize as DuckDB TIMESTAMP
    from duckdb_service_spark.service.serializer import query_result

    out = query_result(t["events"].select("ts"))
    assert out["types"] == ["TIMESTAMP"]
    assert out["values"][1][0] == "2021-06-01 10:30:00.999999"
