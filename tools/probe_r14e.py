"""Round-14 probe battery #3 — postfix factorial over expression terms."""

PROBES = [
    "SELECT 1 + 3! AS r",
    "SELECT 2 * 3! AS r",
    "SELECT 10 - 7! AS r",
    "SELECT 7 % 4! AS r",
    "SELECT -3! AS r",
    "SELECT (3)! AS r",
    "SELECT 3 ! AS r",
    "SELECT abs(-3)! AS r",
    "SELECT 5! AS r",
    "SELECT 20! AS r",
    "SELECT 21! AS r",
    "SELECT 33! AS r",
    "SELECT 34! AS r",
    "SELECT NULL! AS r",
    "SELECT '3'! AS r",
    "SELECT '3.5'! AS r",
    "SELECT 3! = 7 AS r",
    "SELECT 3!=7 AS r",
    "SELECT 3! < 7 AS r",
    "SELECT 3! > 100 AS r",
    "SELECT 3! IN (6) AS r",
    "SELECT 2 + 3! = 120 AS r",
    "SELECT 3! BETWEEN 5 AND 7 AS r",
    "SELECT NOT 3! = 7 AS r",
    "SELECT CASE 3! WHEN 6 THEN 'y' END AS r",
    "SELECT abs(3!) AS r",
    "SELECT [3!] AS r",
    "SELECT 1, 3! AS r",
    "SELECT CASE WHEN 1=1 THEN 1+2! END AS r",
    "SELECT 3! IS NULL AS r",
    # error contracts
    "SELECT 3! + 1 AS r",
    "SELECT 5! - 3! AS r",
    "SELECT 3.0! AS r",
    "SELECT (1=1)! AS r",
    "SELECT sqrt(4)! AS r",
    "SELECT 6 / 3! AS r",
    # columns
    "SELECT x! AS r FROM (SELECT 4 AS x) t",
    "SELECT x + 1! AS r FROM (SELECT 4 AS x) t",
    "SELECT x! AS r FROM (SELECT CAST(3 AS BIGINT) AS x) t",
    # regression: != keeps working
    "SELECT 1 AS r WHERE 3 != 4",
]

bad = batch(PROBES)
