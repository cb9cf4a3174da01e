"""Round-14 probe battery #4 — composite -> VARCHAR render shapes."""

PROBES = [
    "SELECT CAST([1, 2] AS VARCHAR) AS r",
    "SELECT CAST(['a', 'b c'] AS VARCHAR) AS r",
    "SELECT CAST(['a,b', NULL] AS VARCHAR) AS r",
    "SELECT CAST([1.5, NULL] AS VARCHAR) AS r",
    "SELECT CAST([CAST(1e16 AS DOUBLE)] AS VARCHAR) AS r",
    "SELECT CAST([true, false] AS VARCHAR) AS r",
    "SELECT CAST([TIMESTAMP '2020-01-01 01:02:03'] AS VARCHAR) AS r",
    "SELECT CAST([DATE '2020-01-02'] AS VARCHAR) AS r",
    "SELECT CAST({'a': 1} AS VARCHAR) AS r",
    "SELECT CAST({'a': 1, 'b': 'x'} AS VARCHAR) AS r",
    "SELECT CAST({'a': 'x y'} AS VARCHAR) AS r",
    "SELECT CAST({'a': ['p', 'q']} AS VARCHAR) AS r",
    "SELECT CAST({'a': NULL} AS VARCHAR) AS r",
    "SELECT CAST({'a': MAP {'x': 1}} AS VARCHAR) AS r",
    "SELECT CAST(MAP {'k': 1} AS VARCHAR) AS r",
    "SELECT CAST(MAP {'k 1': 'v 2'} AS VARCHAR) AS r",
    "SELECT CAST(MAP {'k': NULL} AS VARCHAR) AS r",
    "SELECT CAST(MAP {1: 2.5} AS VARCHAR) AS r",
    "SELECT CAST(CAST(NULL AS STRUCT(a INTEGER)) AS VARCHAR) AS r",
    "SELECT CAST(CAST(NULL AS INTEGER[]) AS VARCHAR) AS r",
    "SELECT CAST([''] AS VARCHAR) AS r",
    "SELECT CAST(['it''s'] AS VARCHAR) AS r",
    "SELECT CAST({'a': ''} AS VARCHAR) AS r",
    "SELECT CAST([[1], [2, 3]] AS VARCHAR) AS r",
    "SELECT TRY_CAST([1, 2] AS VARCHAR) AS r",
    # column sources
    "SELECT CAST(li AS VARCHAR) AS r FROM (SELECT [1, 2] AS li) t",
    "SELECT CAST(st AS VARCHAR) AS r FROM (SELECT {'a': 5, 'b': 'x'} AS st) t",
    "SELECT CAST(mp AS VARCHAR) AS r FROM (SELECT MAP {'k': 7} AS mp) t",
    # regression: scalar casts untouched
    "SELECT CAST(1.5 AS VARCHAR) AS r",
    "SELECT CAST('x' AS VARCHAR) AS r",
    "SELECT CAST(n_name AS VARCHAR) AS r FROM (SELECT 'ALGERIA' AS n_name) t",
]

bad = batch(PROBES)
