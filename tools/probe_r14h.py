"""Round-14 probe battery #6 — map equality."""

PROBES = [
    "SELECT MAP{'k':1} = MAP{'k':1} AS r",
    "SELECT MAP{'a':1,'b':2} = MAP{'b':2,'a':1} AS r",
    "SELECT MAP{'k':1} <> MAP{'k':2} AS r",
    "SELECT CAST(NULL AS MAP(VARCHAR,INTEGER)) = MAP{'k':1} AS r",
    "SELECT MAP{'k':1} = MAP{'k':NULL} AS r",
    "SELECT MAP{'k':NULL} = MAP{'k':NULL} AS r",
    "SELECT MAP{'a':1,'b':2} = MAP{'a':9,'b':NULL} AS r",
    "SELECT MAP{'a':1} = MAP{'b':NULL} AS r",
    "SELECT MAP{'a':1,'b':NULL} = MAP{'a':1,'b':NULL} AS r",
    "SELECT MAP{'a':1} = MAP{'a':1,'b':2} AS r",
    "SELECT MAP{'a':NULL} = MAP{'a':1} AS r",
    "SELECT m = MAP{'k':1} AS r FROM (SELECT MAP{'k':1} AS m) t",
    "SELECT CASE WHEN MAP{'k':1} = MAP{'k':1} THEN 'y' END AS r",
    "SELECT map_from_entries([('a', 1)]) = MAP{'a':1} AS r",
    # regression: scalar comparisons in map-bearing statements untouched
    "SELECT u = 1 AS r FROM (SELECT 1 AS u, MAP{'k':1} AS m) t",
    "SELECT map_values(MAP{'k':5})[1] = 5 AS r",
]

bad = batch(PROBES)
