"""Round-13 probe battery #5 — composite-lane edges beyond the verdict set."""

PROBES = [
    # composite LHS in IN lists
    "SELECT length('abc') IN ('3', 5) AS r",
    "SELECT 1+2 IN ('3') AS r",
    "SELECT length('abc') IN ('x') AS r",        # DuckDB conversion error
    # window composite in a branch
    "SELECT COALESCE(row_number() OVER (), '7') AS r",
    # pg_typeof over the union shim
    "SELECT pg_typeof(union_value(num := 2)) AS r",
    # list / struct / nested / subquery composites beside string literals
    "SELECT COALESCE([1,2][1], '9') AS r",
    "SELECT COALESCE({'a': 5}.a, '9') AS r",
    "SELECT COALESCE(COALESCE(NULL, 3), '9') AS r",
    "SELECT COALESCE((SELECT 4), '9') AS r",
    # boolean lane coercion
    "SELECT COALESCE(1=1, 'true') AS r",
    "SELECT GREATEST(1=1, 'true') AS r",         # DuckDB binder error
    "SELECT CASE WHEN 1=0 THEN 1=1 ELSE 'true' END AS r",
]

bad = batch(PROBES)
