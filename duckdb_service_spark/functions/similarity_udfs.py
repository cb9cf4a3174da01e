"""String-similarity scalar functions DuckDB ships natively but Spark lacks:
jaro_similarity, jaro_winkler_similarity, damerau_levenshtein.

These are per-row dynamic-programming algorithms with no Spark built-in or
SQL-expressible form, so they take the sanctioned slow path: Arrow-batched
pandas UDFs (never row-at-a-time ``F.udf``). Registered lazily and
idempotently on a session via :func:`ensure_similarity_udfs`; the dialect
then passes the DuckDB names straight through.

Measured DuckDB semantics (probed on 1.x, pinned in
tests/test_similarity_udfs.py):

- All three operate on UTF-8 BYTES, not codepoints:
  ``damerau_levenshtein('héllo','hello') = 2`` (é is two bytes), and jaro
  similarity likewise counts bytes.
- ``jaro_similarity`` returns 0.0 whenever either input is empty
  (including BOTH empty), 1.0 for identical non-empty strings.
- ``jaro_winkler_similarity`` applies the standard Winkler boost
  ``j + l*0.1*(1-j)`` with common-prefix ``l`` capped at 4, ONLY when the
  Jaro score exceeds the 0.7 boost threshold (measured: jaro 0.667 with a
  5-byte common prefix gets NO boost).
- ``damerau_levenshtein`` is TRUE Damerau-Levenshtein (unrestricted, with
  the alphabet table), not the restricted OSA variant:
  ``damerau_levenshtein('CA','ABC') = 2`` (OSA would give 3).
- NULL in → NULL out.

At 100 TB these stay fully distributed (one Arrow batch per partition
chunk, no shuffle, no driver involvement); a production deployment would
swap the per-row Python DP for a native library behind the same UDF
signature.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _jaro(a: bytes, b: bytes) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = True
                match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler(a: bytes, b: bytes) -> float:
    j = _jaro(a, b)
    if j <= 0.7:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def _damerau_levenshtein(a: bytes, b: bytes) -> int:
    # unrestricted DL with the alphabet table (Lowrance-Wagner)
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[int, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _pair_apply(a: pd.Series, b: pd.Series, fn, null):
    out = []
    for x, y in zip(a, b):
        if x is None or y is None or x is pd.NA or y is pd.NA:
            out.append(null)
        else:
            out.append(fn(str(x).encode("utf-8"), str(y).encode("utf-8")))
    return pd.Series(out, dtype="float64" if null is None else "object")


def _jaro_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    return _pair_apply(a, b, _jaro, None)


def _jaro_winkler_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    return _pair_apply(a, b, _jaro_winkler, None)


def _damerau_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        if x is None or y is None:
            out.append(None)
        else:
            out.append(
                _damerau_levenshtein(
                    str(x).encode("utf-8"), str(y).encode("utf-8")
                )
            )
    return pd.Series(out, dtype="Int64")


def _nfc_batch(x: pd.Series) -> pd.Series:
    """DuckDB nfc_normalize twin: Unicode NFC composition. Python
    unicodedata vs DuckDB's utf8proc — differential-tested; both track the
    Unicode standard's canonical composition."""
    import unicodedata

    return pd.Series(
        [
            None if v is None else unicodedata.normalize("NFC", str(v))
            for v in x
        ],
        dtype="object",
    )


_REGISTERED: set[int] = set()


def ensure_similarity_udfs(spark) -> None:
    """Idempotently register the three similarity UDFs on ``spark`` (keyed
    by session identity, so vanilla driver sessions get them too). UDF
    objects are created here, not at import — pandas_udf needs an active
    SparkContext to parse its return type."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.udf.register("jaro_similarity", pandas_udf(_jaro_batch, "double"))
    spark.udf.register(
        "jaro_winkler_similarity", pandas_udf(_jaro_winkler_batch, "double")
    )
    spark.udf.register(
        "damerau_levenshtein", pandas_udf(_damerau_batch, "long")
    )
    spark.udf.register("nfc_normalize", pandas_udf(_nfc_batch, "string"))
    _REGISTERED.add(key)
