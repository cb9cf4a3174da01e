"""Round-11 live probes: the two VERDICT cast-contract holes, the ADVICE
NULL-double->VARCHAR divergence, and nested-cast recursion — engine vs
live DuckDB."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from duckdb_service_spark.service.executor import Engine
from duckdb_service_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe_r11")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, tempfile.mkdtemp(prefix="warehouse_probe_"))
    con = duckdb.connect()

    probes = [
        # VERDICT #1a: decimal tightening overflow must raise
        "SELECT CAST(CAST(9999999.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
        # tightening that FITS must still succeed with same value
        "SELECT CAST(CAST(123456.654321 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
        "SELECT CAST(CAST(1.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
        "SELECT CAST(CAST(-2.5115 AS DECIMAL(18,4)) AS DECIMAL(9,3)) AS v",
        # scale-shrink rounding carry at equal units
        "SELECT CAST(CAST(999999999999.9 AS DECIMAL(13,1)) AS DECIMAL(12,0)) AS v",
        # TRY_CAST tightening stays NULL
        "SELECT TRY_CAST(CAST(9999999.999999 AS DECIMAL(18,6)) AS DECIMAL(9,3)) AS v",
        # VERDICT #1b: literal-source cast inside a subquery
        "SELECT v FROM (SELECT CAST('apple' AS INTEGER) AS v) t",
        "SELECT v FROM (SELECT TRY_CAST('apple' AS INTEGER) AS v) t",
        "SELECT v FROM (SELECT CAST('42' AS INTEGER) AS v) t",
        # ADVICE high: NULL double/float -> VARCHAR must be NULL not 'nan'
        "SELECT CAST(CAST(NULL AS DOUBLE) AS VARCHAR) AS v",
        "SELECT TRY_CAST(CAST(NULL AS DOUBLE) AS VARCHAR) AS v",
        "SELECT CAST(CAST(NULL AS FLOAT) AS VARCHAR) AS v",
        "SELECT CAST(CAST(1.5 AS DOUBLE) AS VARCHAR) AS v",
        # ADVICE low: nested failable cast under a no-guard outer cast
        "SELECT CAST(CAST('apple' AS INTEGER) AS BIGINT) AS v",
        "SELECT CAST(CAST('17' AS INTEGER) AS BIGINT) AS v",
        "SELECT TRY_CAST(CAST('17' AS INTEGER) AS BIGINT) AS v",
        # doubled-quote literals through the scanners
        "SELECT CAST('it''s' AS VARCHAR) AS v",
        "SELECT CAST('a'' AS ''b' AS VARCHAR) AS v",
        "SELECT CAST('12''3' AS VARCHAR) AS v",
    ]
    for q in probes:
        try:
            want = ("OK", con.execute(q).fetchall())
        except Exception as e:
            want = ("ERR", type(e).__name__ + ": " + str(e).split("\n")[0][:80])
        try:
            got = ("OK", [tuple(r) for r in eng.query_df(q).collect()])
        except Exception as e:
            got = ("ERR", type(e).__name__ + ": " + str(e).split("\n")[0][:80])
        status = (
            "MATCH"
            if got[0] == want[0] and (got[0] == "ERR" or got[1] == want[1])
            else "DIVERGE"
        )
        print(f"{status}  {q}")
        if status == "DIVERGE":
            print(f"   duck : {want}")
            print(f"   spark: {got}")


if __name__ == "__main__":
    main()
