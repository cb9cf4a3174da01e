"""Building-block checks for the r14 composite-lane emission strategy."""

BLOCKS = [
    "SELECT {'a': CAST(NULL AS INTEGER)} AS r",
    "SELECT {'a': CAST('2' AS INTEGER)} AS r",
    "SELECT MAP {'k': CAST('2' AS INTEGER)} AS r",
    "SELECT MAP {CAST('1' AS INTEGER): 2} AS r",
    "SELECT CAST(NULL AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST(NULL AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST(NULL AS INTEGER[][]) AS r",
    "SELECT MAP {} AS r",
    "SELECT list_transform(['1','2'], __e -> CAST(__e AS INTEGER)) AS r",
]
for q in BLOCKS:
    d(q, show_types=True)

# does the engine support CAST(raise_error AS composite)?
try:
    df = eng.query_df("SELECT CASE WHEN 1=0 THEN [1] ELSE CAST(raise_error('boom') AS INTEGER[]) END AS r")
    print("raise-in-list-lane ->", df.collect())
except Exception as e:
    print("raise-in-list-lane ERR:", str(e).splitlines()[0][:200])
try:
    df = eng.query_df("SELECT COALESCE([1], CAST(raise_error('boom') AS INTEGER[])) AS r")
    print("lazy-coalesce ->", df.collect())
except Exception as e:
    print("lazy-coalesce ERR:", str(e).splitlines()[0][:200])
