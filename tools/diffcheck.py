"""Local differential harness — mimics the driver's correctness loop.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet fixtures, then compares:
  - row count
  - column names (sorted)
  - values: exact first; reports near-miss floats separately so we can tell
    "engine semantics wrong" apart from "last-ulp float noise".

Usage: python tools/diffcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _norm(v):
    """Normalize a cell for comparison across engines."""
    if isinstance(v, _decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return (type(v).__name__, v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _close(a, b):
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        if a[0] in ("f", "dec") and b[0] in ("f", "dec"):
            try:
                fa, fb = float(a[1] if a[0] == "dec" else a[1]), float(b[1] if b[0] == "dec" else b[1])
            except (TypeError, ValueError):
                return False
            if math.isnan(fa) and math.isnan(fb):
                return True
            return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
        if a[0] == b[0] == "arr":
            return len(a[1]) == len(b[1]) and all(_close(x, y) for x, y in zip(a[1], b[1]))
    return False


def _rows_close(ra, rb):
    return len(ra) == len(rb) and all(_close(a, b) for a, b in zip(ra, rb))


def _pandas_canon(pdf):
    """Model of the driver's canonicalizer: sort columns by name, sort rows
    by every column (pandas lexsort — crashes on unhashable cells exactly
    like the driver's), then hash the CSV text. ``to_csv`` stringifies
    per-cell, so dtype-only differences that print identically (date objects
    vs midnight datetime64) pass, while Decimal-vs-float (``45.000000`` vs
    ``45.0``) and HUGEINT-as-float (``123.0`` vs ``123``) fail — matching the
    observed r01 verdicts."""
    import hashlib

    pdf = pdf[sorted(pdf.columns)]
    try:
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    except TypeError as ex:
        return None, f"CANON-CRASH {ex}"
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest(), None


def canon_compare(name, sdf, con, sql):
    """Driver-model comparison: spark.toPandas() vs duckdb .df()."""
    spdf = sdf.toPandas()
    opdf = con.execute(sql).df()
    sh, serr = _pandas_canon(spdf)
    oh, oerr = _pandas_canon(opdf)
    if serr or oerr:
        return f"spark:{serr or 'ok'} oracle:{oerr or 'ok'}"
    if sh != oh:
        sd = {c: str(spdf[c].dtype) for c in sorted(spdf.columns)}
        od = {c: str(opdf[c].dtype) for c in sorted(opdf.columns)}
        dd = {c: (sd[c], od.get(c)) for c in sd if sd[c] != od.get(c)}
        return f"HASH-MISMATCH dtype-deltas={dd or 'none (value-level)'}"
    return "OK"


def compare(name, sdf, con, sql):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    status = []
    if len(srows) != len(orows):
        return f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
    sc, sr = _rowset(scols, srows)
    oc, orr = _rowset(ocols, orows)
    if sc != oc:
        return f"COLUMNS spark={sc} oracle={oc}"
    exact = sum(1 for a, b in zip(sr, orr) if a == b)
    if exact == len(sr):
        return "OK"
    near = sum(1 for a, b in zip(sr, orr) if _rows_close(a, b))
    if near == len(sr):
        ex = next((a, b) for a, b in zip(sr, orr) if a != b)
        return f"FLOAT-NEAR ({len(sr)-exact}/{len(sr)} inexact) e.g. {ex[0]} vs {ex[1]}"
    bad = next((a, b) for a, b in zip(sr, orr) if not _rows_close(a, b))
    return f"VALUES ({len(sr)-near}/{len(sr)} mismatched) e.g.\n  spark : {bad[0]}\n  oracle: {bad[1]}"


def main():
    argv = [a for a in sys.argv[1:] if a != "--canon"]
    canon = "--canon" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as e
    from duckdb_service_spark.session import get_spark
    from duckdb_service_spark.sources import TABLES, table_path

    spark = get_spark("diffcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"{name:40s} ROWS-ONLY rows={n} ({time.time()-t0:.1f}s)")
                continue
            verdict = (
                canon_compare(name, sdf, con, oracles[name])
                if canon
                else compare(name, sdf, con, oracles[name])
            )
        except Exception as ex:  # noqa: BLE001
            verdict = f"ERROR {type(ex).__name__}: {ex}"
        ok = verdict == "OK"
        failures += 0 if ok else 1
        print(f"{name:40s} {verdict} ({time.time()-t0:.1f}s)")
    print(f"\n{'PASS' if failures == 0 else 'FAIL'}: {len(qs)-failures}/{len(qs)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
