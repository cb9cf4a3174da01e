"""DuckDB's DOUBLE/FLOAT -> VARCHAR cast format, reproduced exactly.

DuckDB prints floats with the shortest round-trip representation and
switches to exponent notation ('1e+16', '1e-07') outside
[1e-4, 1e16) — the SAME rules as Python's float repr and NumPy's
float32 str (verified value-by-value in tools/sweep_casts.py probes:
1e8 -> '100000000.0', 1e16 -> '1e+16', 1e-7 -> '1e-07', -1e300 ->
'-1e+300', inf/nan -> 'inf'/'nan'; float32 0.1 -> '0.1',
3.4e38 -> '3.4e+38'). Spark's cast prints Java-style '1.0E8' with
different thresholds, so the service cast-contract pass routes
double/float -> VARCHAR casts through these Arrow pandas UDFs instead.

Only divergence handled specially: DuckDB prints -0.0 as '0.0'.

Module-level named functions (the pandas-UDF pickling rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _repr_double(v) -> "str | None":
    if v is None or (isinstance(v, float) and v != v and not np.isnan(v)):
        return None
    f = float(v)
    if f == 0.0:
        return "0.0"  # DuckDB prints -0.0 unsigned (measured)
    return repr(f)


def _double_str_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if pd.isna(v) and not _is_nan(v) else
                 ("nan" if _is_nan(v) else _repr_double(v)))


def _is_nan(v) -> bool:
    try:
        return isinstance(v, float) and np.isnan(v)
    except Exception:
        return False


def _repr_float32(v) -> "str | None":
    f = np.float32(v)
    if f == np.float32(0.0):
        return "0.0"
    return str(f)


def _float_str_batch(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: None
        if pd.isna(v) and not _is_nan(v)
        else ("nan" if _is_nan(v) else _repr_float32(v))
    )


_SCALAR_DUCK_NAMES = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INTEGER",
    "integer": "INTEGER", "bigint": "BIGINT", "float": "FLOAT",
    "double": "DOUBLE", "string": "VARCHAR", "boolean": "BOOLEAN",
    "date": "DATE", "binary": "BLOB", "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP WITH TIME ZONE", "void": '"NULL"',
    "variant": "JSON", "time(6)": "TIME", "time": "TIME",
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def duck_type_text(s: str) -> "str | None":
    """Spark simpleString (typeof() output) -> DuckDB type name, for the
    composite shapes the SQL-level typeof CASE can't express (measured:
    typeof([1,2]) = 'INTEGER[]', typeof(MAP {'x': 1}) =
    'MAP(VARCHAR, INTEGER)', typeof({'a': 5}) = 'STRUCT(a INTEGER)')."""
    if s is None:
        return None
    t = s.strip()
    low = t.lower()
    if low in _SCALAR_DUCK_NAMES:
        return _SCALAR_DUCK_NAMES[low]
    if low.startswith("decimal(") or low.startswith("interval"):
        return "INTERVAL" if low.startswith("interval") else t.upper()
    if low.startswith("array<") and low.endswith(">"):
        return f"{duck_type_text(t[6:-1])}[]"
    if low.startswith("map<") and low.endswith(">"):
        kv = _split_top(t[4:-1])
        if len(kv) == 2:
            return (
                f"MAP({duck_type_text(kv[0])}, {duck_type_text(kv[1])})"
            )
    if low.startswith("struct<") and low.endswith(">"):
        fields = []
        for f in _split_top(t[7:-1]):
            name, _, ft = f.partition(":")
            if not ft:
                return t.upper()
            fields.append(f"{name.strip()} {duck_type_text(ft)}")
        return f"STRUCT({', '.join(fields)})"
    return t.upper()


def _type_name_batch(s: pd.Series) -> pd.Series:
    return s.map(duck_type_text)


def _list_split_one(s) -> "list | None":
    """DuckDB's string->LIST bracket grammar, element-split only (r14):
    trim; require [ ]; split on top-level commas via the shared
    sql_routing._split_list_body (element-start quotes protect commas,
    brackets/braces nest); elements trimmed, bare NULL tokens become
    NULL entries. Returns None on grammar failure (the SQL wrapper
    distinguishes it from NULL input, which it checks first)."""
    if s is None:
        return None
    from duckdb_service_spark.service.sql_routing import _split_list_body

    v = s.strip()
    if not (v.startswith("[") and v.endswith("]")):
        return None
    body = v[1:-1]
    if not body.strip():
        return []
    parts = _split_list_body(body)
    if parts is None:
        return None
    out = []
    for p in parts:
        el = p.strip()
        out.append(None if el.upper() == "NULL" else el)
    return out


def _list_split_batch(s: pd.Series) -> pd.Series:
    return s.map(_list_split_one)


def _struct_split_one(s) -> "dict | None":
    """DuckDB's string->STRUCT entry grammar, split only (r14): keys
    quoted or bare, values unquoted, duplicates last-wins, bare NULL
    tokens -> None. None = grammar failure (the SQL wrapper checks
    input-NULL first and validates keys against the target fields)."""
    if s is None:
        return None
    from duckdb_service_spark.service.sql_routing import (
        _entry_split,
        _split_composite_body,
        _unquote_token,
    )

    v = s.strip()
    if not (v.startswith("{") and v.endswith("}")):
        return None
    body = v[1:-1]
    if not body.strip():
        return {}
    parts = _split_composite_body(body)
    if parts is None:
        return None
    out: dict = {}
    for p in parts:
        sp = _entry_split(p, ":")
        if sp is None:
            return None
        k, _kq = _unquote_token(sp[0])
        val, was_q = _unquote_token(sp[1])
        out[k] = None if (not was_q and val.strip().upper() == "NULL") else val
    return out


def _struct_split_batch(s: pd.Series) -> pd.Series:
    return s.map(_struct_split_one)


def _map_split_one(s) -> "list | None":
    """DuckDB's string->MAP {k=v} grammar, split only (r14): entry order
    and duplicate keys preserved (the SQL wrapper raises DuckDB's
    unique-keys error on duplicates)."""
    if s is None:
        return None
    from duckdb_service_spark.service.sql_routing import (
        _entry_split,
        _merge_map_pieces,
        _split_composite_body,
        _unquote_token,
    )

    v = s.strip()
    if not (v.startswith("{") and v.endswith("}")):
        return None
    body = v[1:-1]
    if not body.strip():
        return []
    parts = _split_composite_body(body)
    if parts is None:
        return None
    parts = _merge_map_pieces(parts)
    if parts is None:
        return None
    out = []
    for p in parts:
        sp = _entry_split(p, "=")
        if sp is None:
            return None
        k, _kq = _unquote_token(sp[0])
        val, was_q = _unquote_token(sp[1])
        out.append(
            (k, None if (not was_q and val.strip().upper() == "NULL") else val)
        )
    return out


def _map_split_batch(s: pd.Series) -> pd.Series:
    return s.map(_map_split_one)


def _double_arr_batch(s: pd.Series) -> pd.Series:
    """Element-wise DuckDB double repr over a double[] column (r14:
    Spark rejects Python UDFs inside higher-order lambdas, so the
    composite->VARCHAR render converts flat double lists in one shot)."""
    return s.map(
        lambda arr: None
        if arr is None
        else [
            ("nan" if _is_nan(v) else _repr_double(v)) if v is not None
            else None
            for v in arr
        ]
    )


def _float_arr_batch(s: pd.Series) -> pd.Series:
    return s.map(
        lambda arr: None
        if arr is None
        else [
            ("nan" if _is_nan(v) else _repr_float32(v)) if v is not None
            else None
            for v in arr
        ]
    )


_REGISTERED: set[int] = set()


def ensure_format_udfs(spark) -> None:
    """Idempotently register the float-format UDFs (keyed by session
    identity, so vanilla driver sessions get them via tune too)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register("duck_double_str", pandas_udf(_double_str_batch, "string"))
    spark.udf.register("duck_float_str", pandas_udf(_float_str_batch, "string"))
    spark.udf.register("duck_type_name", pandas_udf(_type_name_batch, "string"))
    spark.udf.register(
        "duck_list_split", pandas_udf(_list_split_batch, "array<string>")
    )
    spark.udf.register(
        "duck_double_arr_str", pandas_udf(_double_arr_batch, "array<string>")
    )
    spark.udf.register(
        "duck_float_arr_str", pandas_udf(_float_arr_batch, "array<string>")
    )
    spark.udf.register(
        "duck_struct_split",
        pandas_udf(_struct_split_batch, "map<string,string>"),
    )
    spark.udf.register(
        "duck_map_split",
        pandas_udf(_map_split_batch, "array<struct<k:string,v:string>>"),
    )
    _REGISTERED.add(key)
