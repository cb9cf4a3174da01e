"""Round-13 probe battery — run inside the probe REPL: exec(open('tools/probe_r13.py').read())"""

PROBES = [
    # VERDICT r12 What's wrong #1 — composite branch operands
    "SELECT COALESCE(CASE WHEN 1=0 THEN 1 END, '7') AS v",
    "SELECT COALESCE(NULLIF(1,1), '7') AS v",
    "SELECT COALESCE(1+1, '7') AS v",
    "SELECT GREATEST(1+1, '7') AS v",
    "SELECT CASE WHEN 1=0 THEN (CASE WHEN 1=1 THEN 1 END) ELSE '7' END AS v",
    "SELECT COALESCE(upper('x'), 1) AS v",          # binder error
    "SELECT COALESCE(1, ('7')) AS v",               # paren literal
    "SELECT COALESCE(1.5+1, '7') AS v",
    "SELECT COALESCE(upper('x'), '7') AS v",        # all-string stays VARCHAR
    "SELECT COALESCE(DATE '2020-01-01' + 1, '2021-02-03') AS v",
    "SELECT COALESCE(length('ab'), '7') AS v",
    "SELECT GREATEST(length('ab'), '7') AS v",
    "SELECT LEAST(1+1, '7') AS v",
    "SELECT IF(1=0, 1+1, '7') AS v",
    "SELECT IFNULL(NULLIF(1,1), '7') AS v",
    # regression guards (r12 literal/column shapes must still hold)
    "SELECT CASE WHEN 1=1 THEN 1 ELSE '2' END AS v",
    "SELECT COALESCE('2', 1) AS v",
    "SELECT COALESCE(NULL, '2', 1) AS v",           # binder error
    "SELECT GREATEST(1, '2') AS v",
    "SELECT COALESCE(1, '2', 1.5) AS v",
]

AGG_PROBES = [
    # aggregates in branches, over a real FROM
    ("SELECT COALESCE(max(v), '9') AS v FROM (VALUES (1),(2)) s(v)",),
    ("SELECT COALESCE(min(v), '9') AS v FROM (VALUES (1),(2)) s(v)",),
]

bad = batch(PROBES)
for (q,) in AGG_PROBES:
    d(q)
