"""Round-13 probe battery #3 — ADVICE r13 fixes, union typeof names,
underscore alias parity, VALUES cast guard."""

PROBES = [
    # ADVICE 1: overlapping interval regexes
    "SELECT TIMESTAMP '2020-01-01' + INTERVAL '2 days'::INTERVAL AS r",
    "SELECT TIMESTAMP '2020-01-01' + INTERVAL '2 days' AS r",
    "SELECT TIMESTAMP '2020-01-01' + '2 days'::INTERVAL AS r",
    "SELECT TIMESTAMP '2020-01-01 01:00' + INTERVAL '1:02:03'::INTERVAL AS r",
    # ADVICE 4: bare current_timestamp keyword gets the +00 varchar form
    "SELECT CAST(current_timestamp AS VARCHAR) LIKE '%+00' AS r",
    "SELECT CAST(now() AS VARCHAR) LIKE '%+00' AS r",
    # union typeof / union_tag names
    "SELECT typeof(union_value(num := 2)) AS t",
    "SELECT typeof(union_value(s := 'x')) AS t",
    "SELECT typeof(union_value(d := 1.25)) AS t",
    "SELECT typeof(union_value(num := 2)::UNION(num INTEGER, str VARCHAR)) AS t",
    "SELECT typeof(union_tag(union_value(num := 2))) AS t",
    "SELECT union_tag(union_value(num := 2)) AS r",
    # underscore literal+alias parity
    "SELECT 1__0",
    "SELECT 1_000_",
    "SELECT 1.5__x",
    "SELECT 1_000",
    # VALUES rows keep plain casts (guards are illegal in inline tables)
    "SELECT v FROM (VALUES (CAST(1.0 AS DECIMAL(3,1))),(CAST(2.1 AS DECIMAL(3,1)))) s(v)",
    "SELECT v FROM (VALUES (CAST('7' AS INTEGER)),(8)) s(v)",
]


def dcols(sql):
    """Compare values AND column names."""
    try:
        r = con.execute(sql)
        want = ("OK", r.fetchall(), [dd[0] for dd in r.description])
    except Exception as e:
        want = ("ERR", str(e).splitlines()[0], None)
    try:
        df = eng.query_df(sql)
        got = ("OK", [tuple(x) for x in df.collect()], df.columns)
    except Exception as e:
        got = ("ERR", str(e).splitlines()[0], None)
    ok = got[0] == want[0] and (got[0] == "ERR" or
                                (got[1] == want[1] and got[2] == want[2]))
    print(("MATCH " if ok else "DIFF  ") + sql)
    if not ok:
        print(f"  spark={got}")
        print(f"  duck ={want}")
    return ok


good = sum(dcols(q) for q in PROBES)
print(f"{good}/{len(PROBES)} MATCH")
