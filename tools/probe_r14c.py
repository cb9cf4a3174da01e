"""Round-14 probe battery #2 — string COLUMN -> list casts on a real table."""

eng.execute("DROP TABLE IF EXISTS t14c")
eng.execute("CREATE TABLE t14c (id INTEGER, s VARCHAR)")
eng.execute(
    "INSERT INTO t14c VALUES (1, '[1, 2]'), (2, '[]'), (3, NULL), "
    "(4, '[7]'), (5, '[1, 2, 3]')"
)
con.execute("DROP TABLE IF EXISTS t14c")
con.execute("CREATE TABLE t14c (id INTEGER, s VARCHAR)")
con.execute(
    "INSERT INTO t14c VALUES (1, '[1, 2]'), (2, '[]'), (3, NULL), "
    "(4, '[7]'), (5, '[1, 2, 3]')"
)

PROBES = [
    "SELECT id, CAST(s AS INTEGER[]) AS r FROM t14c ORDER BY id",
    "SELECT id, TRY_CAST(s AS INTEGER[]) AS r FROM t14c ORDER BY id",
    "SELECT id, CAST(s AS VARCHAR[]) AS r FROM t14c ORDER BY id",
    "SELECT id, CAST(s AS DOUBLE[]) AS r FROM t14c ORDER BY id",
]
bad = batch(PROBES)

# rows with bad elements / bad grammar
eng.execute("DROP TABLE IF EXISTS t14d")
eng.execute("CREATE TABLE t14d (id INTEGER, s VARCHAR)")
eng.execute("INSERT INTO t14d VALUES (1, '[1, x]'), (2, 'zzz'), (3, '[2.9]')")
con.execute("DROP TABLE IF EXISTS t14d")
con.execute("CREATE TABLE t14d (id INTEGER, s VARCHAR)")
con.execute("INSERT INTO t14d VALUES (1, '[1, x]'), (2, 'zzz'), (3, '[2.9]')")

PROBES2 = [
    "SELECT TRY_CAST(s AS INTEGER[]) AS r FROM t14d ORDER BY id",
    "SELECT CAST(s AS INTEGER[]) AS r FROM t14d WHERE id = 1",
    "SELECT CAST(s AS INTEGER[]) AS r FROM t14d WHERE id = 2",
    "SELECT CAST(s AS INTEGER[]) AS r FROM t14d WHERE id = 3",
    "SELECT CAST(upper(s) AS VARCHAR[]) AS r FROM t14d WHERE id = 1",
    # NULL-token elements
    "SELECT CAST('[1, NULL, 3]' AS INTEGER[]) AS r",
    "SELECT TRY_CAST('[1, NULL]' AS INTEGER[]) AS r",
]
bad2 = batch(PROBES2)
