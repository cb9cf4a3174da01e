"""DuckDB JSON functions Spark lacks entirely: json_merge_patch,
json_structure, json_contains (VERDICT r08 task 5 — the last documented
clean-raise JSON tail, reachable through the reference's SQL passthrough,
NamanMahor/duckdb-service db/db.go:70).

No Spark built-in or VARIANT expression reproduces these (merge-patch is
recursive-structural, structure inference has DuckDB-specific type-name
unification, containment is recursive-descent), so they take the
sanctioned slow path: Arrow-batched pandas UDFs (never row-at-a-time
``F.udf``), registered idempotently per session like the libm/similarity
batteries.

Measured DuckDB semantics (probed on 1.x, pinned in tests/test_idioms_r09b.py):

- ``json_merge_patch`` folds left-to-right with RFC 7386 at each step,
  but SQL NULL is handled asymmetrically: a NULL RIGHT operand wipes the
  accumulator to NULL, a NULL LEFT operand yields the right
  (measured: (a, NULL, c) -> c;  (NULL, a, NULL) -> NULL). Nested nulls
  in the patch DELETE keys, a non-object patch replaces wholesale, and
  object key order is target-keys-first then new patch keys.
- ``json_structure``: non-negative integers -> "UBIGINT", negative ->
  "BIGINT", out-of-64-bit-range or decimal/exponent -> "DOUBLE", string
  -> "VARCHAR", bool -> "BOOLEAN", null -> "NULL"; arrays unify their
  element structures (NULL yields, UBIGINT+BIGINT -> BIGINT, any numeric
  with DOUBLE -> DOUBLE, objects union keys, incompatible -> "JSON");
  the EMPTY OBJECT is "JSON" (measured), the empty array ["NULL"].
- ``json_contains(doc, needle)`` is recursive-descent containment: the
  needle may match at ANY node of the document (measured:
  {"a":{"b":1}} contains {"b":1}); at a node, object needles need every
  key contained, array needles need every element matched by some target
  element, scalars compare TYPE-STRICTLY (1 does not contain 1.0, nor
  "1").

At 100 TB these stay fully distributed: one Arrow batch per partition
chunk, no shuffle, no driver involvement.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from pyspark.sql.functions import pandas_udf


# ---- json_merge_patch (RFC 7386 step) --------------------------------------


def _merge_patch(target, patch):
    # key order matches DuckDB's yyjson merge: target keys NOT in the
    # patch first (original order), then the patch's non-null keys in
    # patch order — an UPDATED key moves to the end (measured:
    # {"a":1,"b":2} + {"a":1} = {"b":2,"a":1})
    if isinstance(patch, dict):
        t = target if isinstance(target, dict) else {}
        out = {k: v for k, v in t.items() if k not in patch}
        for k, v in patch.items():
            if v is not None:
                out[k] = _merge_patch(t.get(k), v)
        return out
    return patch


def _dumps(v) -> str:
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _merge_patch_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        # measured NULL fold: NULL right -> NULL, NULL left -> right
        if y is None:
            out.append(None)
        elif x is None:
            out.append(y)
        else:
            try:
                out.append(_dumps(_merge_patch(json.loads(x), json.loads(y))))
            except (ValueError, TypeError):
                out.append(None)
    return pd.Series(out, dtype="object")


# ---- json_structure ---------------------------------------------------------

_NUMERIC = {"UBIGINT", "BIGINT", "DOUBLE"}


def _unify(a, b):
    if a == "NULL":
        return b
    if b == "NULL":
        return a
    if a == b:
        return a
    if isinstance(a, str) and isinstance(b, str) and a in _NUMERIC and b in _NUMERIC:
        return "DOUBLE" if "DOUBLE" in (a, b) else "BIGINT"
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _unify(out[k], v) if k in out else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        return [_unify(a[0], b[0])]
    return "JSON"


def _structure(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        if 0 <= v < 1 << 64:
            return "UBIGINT"
        if -(1 << 63) <= v < 0:
            return "BIGINT"
        return "DOUBLE"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, list):
        acc = "NULL"
        for e in v:
            acc = _unify(acc, _structure(e))
        return [acc]
    # object: the EMPTY object is "JSON" (measured)
    if not v:
        return "JSON"
    return {k: _structure(x) for k, x in v.items()}


def _structure_batch(x: pd.Series) -> pd.Series:
    out = []
    for v in x:
        if v is None:
            out.append(None)
        else:
            try:
                out.append(_dumps(_structure(json.loads(v))))
            except (ValueError, TypeError):
                out.append(None)
    return pd.Series(out, dtype="object")


# ---- json_contains ----------------------------------------------------------


def _scalar_eq(t, n) -> bool:
    if isinstance(t, bool) or isinstance(n, bool):
        return t is n
    if isinstance(t, (int, float)) and isinstance(n, (int, float)):
        # type-strict: 1 does not contain 1.0 (measured)
        if isinstance(t, int) != isinstance(n, int):
            return False
        return t == n or (
            isinstance(t, float) and math.isnan(t) and math.isnan(n)
        )
    return type(t) is type(n) and t == n


def _matches(t, n) -> bool:
    """Containment at this node (no descent)."""
    if isinstance(n, dict):
        return isinstance(t, dict) and all(
            k in t and _matches(t[k], v) for k, v in n.items()
        )
    if isinstance(n, list):
        return isinstance(t, list) and all(
            any(_matches(e, x) for e in t) for x in n
        )
    if isinstance(t, (dict, list)):
        return False
    return _scalar_eq(t, n)


def _contains(t, n) -> bool:
    if _matches(t, n):
        return True
    if isinstance(t, dict):
        return any(_contains(v, n) for v in t.values())
    if isinstance(t, list):
        return any(_contains(e, n) for e in t)
    return False


def _contains_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        if x is None or y is None:
            out.append(None)
        else:
            try:
                out.append(_contains(json.loads(x), json.loads(y)))
            except (ValueError, TypeError):
                out.append(None)
    return pd.Series(out, dtype="object")


_REGISTERED: set[int] = set()


def ensure_json_udfs(spark) -> None:
    """Idempotently register the three JSON UDFs on ``spark`` (keyed by
    session identity, so vanilla driver sessions get them too)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register(
        "duck_json_merge_patch", pandas_udf(_merge_patch_batch, "string")
    )
    spark.udf.register("json_structure", pandas_udf(_structure_batch, "string"))
    spark.udf.register("json_contains", pandas_udf(_contains_batch, "boolean"))
    _REGISTERED.add(key)
