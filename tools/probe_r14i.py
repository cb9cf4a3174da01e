"""Round-14 probe battery #7 — string COLUMN -> STRUCT/MAP casts."""

for c in (eng, con):
    c.execute("DROP TABLE IF EXISTS t14i")
    c.execute("CREATE TABLE t14i (id INTEGER, s VARCHAR)")
    c.execute(
        "INSERT INTO t14i VALUES (1, '{''a'': 2, ''b'': x}'), "
        "(2, '{a: 3}'), (3, NULL), (4, '{}'), (5, 'junk'), "
        "(6, '{''a'': 4, ''a'': 5}'), (7, '{''z'': 1}')"
    )
    c.execute("DROP TABLE IF EXISTS t14m")
    c.execute("CREATE TABLE t14m (id INTEGER, s VARCHAR)")
    c.execute(
        "INSERT INTO t14m VALUES (1, '{k=1, j=2}'), (2, '{}'), (3, NULL), "
        "(4, 'junk'), (5, '{k=1, k=2}'), (6, '{k=z}')"
    )

PROBES = [
    "SELECT id, TRY_CAST(s AS STRUCT(a INTEGER, b VARCHAR)) AS r FROM t14i ORDER BY id",
    "SELECT CAST(s AS STRUCT(a INTEGER, b VARCHAR)) AS r FROM t14i WHERE id = 1",
    "SELECT CAST(s AS STRUCT(a INTEGER, b VARCHAR)) AS r FROM t14i WHERE id = 5",
    "SELECT CAST(s AS STRUCT(a INTEGER, b VARCHAR)) AS r FROM t14i WHERE id = 7",
    "SELECT id, TRY_CAST(s AS MAP(VARCHAR, INTEGER)) AS r FROM t14m ORDER BY id",
    "SELECT CAST(s AS MAP(VARCHAR, INTEGER)) AS r FROM t14m WHERE id = 1",
    "SELECT CAST(s AS MAP(VARCHAR, INTEGER)) AS r FROM t14m WHERE id = 4",
    "SELECT CAST(s AS MAP(VARCHAR, INTEGER)) AS r FROM t14m WHERE id = 5",
    "SELECT CAST(s AS MAP(VARCHAR, INTEGER)) AS r FROM t14m WHERE id = 6",
    "SELECT CAST(upper(s) AS MAP(VARCHAR, INTEGER)) AS r FROM t14m WHERE id = 1",
]

bad = batch(PROBES)
