"""libm-backed scalar math functions: gamma, lgamma, nextafter.

DuckDB implements these as thin wrappers over C ``std::tgamma`` /
``std::lgamma`` / ``std::nextafter``. Python's ``math.gamma``/``lgamma`` use
their own algorithm and differ from glibc in the LAST ULP (measured:
``math.gamma(0.5)`` = …5159 vs DuckDB …516), so these UDFs call the SAME
glibc libm through ctypes — a 300-case random differential against DuckDB is
bit-exact (tests/test_libm_udfs.py). ``nextafter`` is pure IEEE-754 bit
manipulation and exact everywhere.

Declared divergence (documented, not silent): DuckDB raises an Out of Range
Error at the gamma poles (0 and negative integers); a vectorized UDF cannot
cheaply pre-validate per value, so the poles return the libm values
(inf/nan) instead of failing the query.

Falls back to ``math.gamma``/``lgamma`` (last-ulp-different) if libm.so.6
is unavailable (non-glibc platforms).
"""

from __future__ import annotations

import ctypes
import math

import pandas as pd
from pyspark.sql.functions import pandas_udf

try:
    _libm = ctypes.CDLL("libm.so.6")
    for _f, _n in (("tgamma", 1), ("lgamma", 1), ("nextafter", 2)):
        getattr(_libm, _f).restype = ctypes.c_double
        getattr(_libm, _f).argtypes = [ctypes.c_double] * _n
    _tgamma = _libm.tgamma
    _lgamma = _libm.lgamma
    _nextafter = _libm.nextafter
except OSError:  # pragma: no cover — non-glibc fallback
    _tgamma = math.gamma
    _lgamma = math.lgamma
    _nextafter = math.nextafter


# NOTE: the batch functions below are module-level named functions on
# purpose — cloudpickle serializes them BY REFERENCE (workers re-import
# this module and rebuild the ctypes handles), whereas a closure capturing
# a ctypes function pointer is unpicklable.


def _gamma_batch(x: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None or pd.isna(v) else _tgamma(float(v)) for v in x],
        dtype="float64",
    )


def _lgamma_batch(x: pd.Series) -> pd.Series:
    return pd.Series(
        [None if v is None or pd.isna(v) else _lgamma(float(v)) for v in x],
        dtype="float64",
    )


def _nextafter_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        if x is None or y is None or pd.isna(x) or pd.isna(y):
            out.append(None)
        else:
            out.append(_nextafter(float(x), float(y)))
    return pd.Series(out, dtype="float64")


_REGISTERED: set[int] = set()


def ensure_libm_udfs(spark) -> None:
    """Idempotently register gamma/lgamma/nextafter on ``spark``."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register("gamma", pandas_udf(_gamma_batch, "double"))
    spark.udf.register("lgamma", pandas_udf(_lgamma_batch, "double"))
    spark.udf.register("nextafter", pandas_udf(_nextafter_batch, "double"))
    _REGISTERED.add(key)
