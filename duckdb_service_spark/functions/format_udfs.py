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


_REGISTERED: set[int] = set()


def ensure_format_udfs(spark) -> None:
    """Idempotently register the float-format UDFs (keyed by session
    identity, so vanilla driver sessions get them via tune too)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register("duck_double_str", pandas_udf(_double_str_batch, "string"))
    spark.udf.register("duck_float_str", pandas_udf(_float_str_batch, "string"))
    _REGISTERED.add(key)
