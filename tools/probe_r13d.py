"""Round-13 probe battery #4 — datetime literal grammar."""

PROBES = [
    # no-seconds rejects (keyword / suffix / CAST), TRY_CAST NULLs
    "SELECT TIMESTAMP '2020-01-01 01:00' AS r",
    "SELECT TIMESTAMPTZ '2020-01-01 01:00' AS r",
    "SELECT '2020-01-01 01:00'::TIMESTAMP AS r",
    "SELECT CAST('2020-01-01 01:00' AS TIMESTAMP) AS r",
    "SELECT TRY_CAST('2020-01-01 01:00' AS TIMESTAMP) AS r",
    "SELECT TIMESTAMP '2020-01-01T01:00' AS r",
    "SELECT TIMESTAMP '2020-01-01 01' AS r",
    "SELECT TIME '01:00' AS r",
    # accepted shapes stay working
    "SELECT TIMESTAMP '2020-01-01 01:00:00' AS r",
    "SELECT TIMESTAMP '2020-01-01' AS r",
    "SELECT TIMESTAMP '2020-01-01 1:2:3' AS r",
    "SELECT TIMESTAMP '2020-01-01 01:00:00.5' AS r",
    "SELECT CAST('2020-01-01 01:00:00' AS TIMESTAMP) AS r",
    "SELECT TRY_CAST('2020-01-01 01:00:00' AS TIMESTAMP) AS r",
    # slash separators normalize (DuckDB accepts, Spark alone would not)
    "SELECT TIMESTAMP '2020/01/01 01:00:00' AS r",
    "SELECT DATE '2020/01/01' AS r",
    "SELECT CAST('2020/01/01' AS DATE) AS r",
    # DATE ignores the remainder after the date prefix
    "SELECT DATE '2020-01-01 junk' AS r",
    "SELECT DATE '2020-01-01T00:00:00' AS r",
    "SELECT DATE '2020-01-01 01:00' AS r",
    # regression guards around the pass
    "SELECT DATE '2020-01-01' + 1 AS r",
    "SELECT TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '2 days' AS r",
    "SELECT CAST(TIMESTAMP '2020-01-01 01:02:03' AS DATE) AS r",
]

bad = batch(PROBES)
