"""Round-14 probe battery — composite-TYPE lanes in branch/variadic folds
(VERDICT r13 task 1) plus string->STRUCT/MAP literal casts and
string->LIST casts of COLUMN sources (task 2).

Run: python -i tools/probe_repl.py  then  exec(open('tools/probe_r14.py').read())
"""

PROBES = [
    # --- verdict task-1 six shapes ---
    "SELECT COALESCE([1], '[2]') AS r",
    "SELECT COALESCE(CAST(NULL AS INTEGER[]), '[2]') AS r",
    "SELECT CASE WHEN 1=0 THEN [1] ELSE '[2]' END AS r",
    "SELECT COALESCE(CASE WHEN 1=0 THEN {'a':1} END, '{''a'': 2}') AS r",
    "SELECT COALESCE(CAST(NULL AS MAP(VARCHAR,INTEGER)), 'nope') AS r",
    "SELECT GREATEST([1,2],'[1,3]') AS r",
    # --- more composite-lane branch shapes ---
    "SELECT COALESCE('[2]', [1]) AS r",
    "SELECT CASE WHEN 1=1 THEN '[2]' ELSE [1] END AS r",
    "SELECT COALESCE(NULL, [1], '[2, 3]') AS r",
    "SELECT COALESCE([1], 'zzz') AS r",
    "SELECT COALESCE(CAST(NULL AS INTEGER[]), 'zzz') AS r",
    "SELECT COALESCE(CAST(NULL AS STRUCT(a INTEGER)), 'junk') AS r",
    "SELECT COALESCE(CAST(NULL AS STRUCT(a INTEGER)), '{''a'': 2}') AS r",
    "SELECT COALESCE(CAST(NULL AS MAP(VARCHAR,INTEGER)), '{k=2}') AS r",
    "SELECT COALESCE(MAP{'k':1}, 'nope') AS r",
    "SELECT CASE WHEN 1=0 THEN MAP{'k':1} ELSE 'x' END AS r",
    "SELECT COALESCE([1.5], '[2]') AS r",
    "SELECT typeof(COALESCE([1],'[2]')) AS r",
    "SELECT LEAST([1,2],'[0,3]') AS r",
    "SELECT GREATEST([1,2],[1,3]) AS r",
    # mixed-family binder errors
    "SELECT COALESCE([1], 4) AS r",
    "SELECT COALESCE({'a':1}, 4) AS r",
    "SELECT COALESCE([1], DATE '2020-01-01') AS r",
    "SELECT CASE WHEN 1=0 THEN [1] ELSE 4 END AS r",
    # --- string -> STRUCT/MAP literal casts (standalone) ---
    "SELECT CAST('{''a'': 2}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{a: 2}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{''b'': 3}' AS STRUCT(a INTEGER, b INTEGER)) AS r",
    "SELECT CAST('{''b'': 3, ''a'': 2}' AS STRUCT(a INTEGER, b INTEGER)) AS r",
    "SELECT CAST('{''a'': 2.9}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{''a'': z}' AS STRUCT(a INTEGER)) AS r",
    "SELECT TRY_CAST('{''a'': z}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{''a'': 2, ''b'': 3}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{''A'': 1}' AS STRUCT(a INTEGER)) AS r",
    "SELECT CAST('{''a'': ''x,y''}' AS STRUCT(a VARCHAR)) AS r",
    "SELECT CAST('{''a'': {''b'': 1}}' AS STRUCT(a STRUCT(b INTEGER))) AS r",
    "SELECT CAST('{''a'': [1,2]}' AS STRUCT(a INTEGER[])) AS r",
    "SELECT CAST('{k=2}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{k=2, j=3}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{k=z}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT TRY_CAST('{k=z}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{1=2}' AS MAP(INTEGER,INTEGER)) AS r",
    "SELECT CAST('{k=2.9}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT TRY_CAST('nope' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{''k''=2}' AS MAP(VARCHAR,INTEGER)) AS r",
    "SELECT CAST('{x=''v,w''}' AS MAP(VARCHAR,VARCHAR)) AS r",
    "SELECT CAST('{k= 2 , j =3}' AS MAP(VARCHAR,INTEGER)) AS r",
]

bad = batch(PROBES)
