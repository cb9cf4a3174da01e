"""Interactive differential probe REPL (round-13 working tool).

Run inside `python -i`: builds one local SparkSession + Engine + a DuckDB
connection, and exposes `d(sql)` which prints engine-vs-DuckDB results for a
statement (value, first error line) so branch-typing / ordered-stat fixes can
be checked live without pytest startup costs.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from duckdb_service_spark.session import get_spark
from duckdb_service_spark.service.executor import Engine

spark = get_spark("probe-repl")
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark, tempfile.mkdtemp(prefix="probe_r13_"))
con = duckdb.connect()


def canon(v):
    """Structural normalization so Spark Rows / dicts compare against
    DuckDB's composite reprs ({'key': [...], 'value': [...]} maps)."""
    from pyspark.sql import Row

    if isinstance(v, Row):
        return canon(v.asDict())
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(
            v.get("key"), list
        ):
            return canon(dict(zip(v["key"], v["value"])))
        return {k: canon(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def d(sql, show_types=False):
    try:
        want = ("OK", [canon(r) for r in con.execute(sql).fetchall()])
    except Exception as e:
        want = ("ERR", str(e).splitlines()[0])
    try:
        df = eng.query_df(sql)
        got = ("OK", [canon(tuple(r)) for r in df.collect()])
    except Exception as e:
        from duckdb_service_spark.service.serializer import duck_error_text

        got = ("ERR", duck_error_text(e).splitlines()[0])
    tag = "MATCH" if got == want else "DIFF "
    print(f"{tag} {sql}")
    if got != want:
        print(f"  spark={got}")
        print(f"  duck ={want}")
    elif show_types:
        print(f"  both ={got}")
    return got == want


def batch(sqls):
    bad = [s for s in sqls if not d(s)]
    print(f"{len(sqls) - len(bad)}/{len(sqls)} MATCH")
    return bad
