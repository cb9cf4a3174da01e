"""Round-14 probe battery #8 — cross-feature compositions of the r14
surfaces (factorial x branch folds, renders x runtime casts, map
equality in predicate position, datetime specials in lanes)."""

PROBES = [
    "SELECT COALESCE(3!, '7') AS r",
    "SELECT GREATEST(3!, '7') AS r",
    "SELECT COALESCE(CAST(NULL AS TIMESTAMP), 'epoch') AS r",
    "SELECT (COALESCE([1], '[2]'))[1] AS r",
    "SELECT CAST(COALESCE([1], '[2]') AS VARCHAR) AS r",
    "SELECT CAST(CAST({'a': 2} AS VARCHAR) AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST(CAST('[1.5]' AS DOUBLE[]) AS VARCHAR) AS r",
    "SELECT (CAST('[3]' AS INTEGER[]))[1]! AS r",
    "SELECT 3! = 6 AND MAP{'a':1} = MAP{'a':1} AS r",
    "SELECT CASE WHEN MAP{'a':1} = MAP{'a':1} THEN 5! END AS r",
    "SELECT typeof(CAST('{k=2}' AS MAP(VARCHAR,INTEGER))) AS r",
    "SELECT CAST(CAST(MAP{'k':7} AS VARCHAR) AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT 1 AS r WHERE MAP{'k':1} = MAP{'k':1}",
    "SELECT CAST('epoch' AS TIMESTAMP) = TIMESTAMP 'epoch' AS r",
]

bad = batch(PROBES)
