"""Round-13 probe battery #2 — ordered stats over DECIMAL table columns
(VERDICT r12 #2: quantile_cont must truncate, not BROUND, at scaled .5)."""

DDL = [
    "DROP TABLE IF EXISTS qd",
    "CREATE TABLE qd(v DECIMAL(2,1))",
    "INSERT INTO qd VALUES (1.1),(1.7),(3.2),(4.5)",
    "DROP TABLE IF EXISTS qn",
    "CREATE TABLE qn(v DECIMAL(3,1))",
    "INSERT INTO qn VALUES (-1.1),(-1.7),(-3.2),(-4.5)",
    "DROP TABLE IF EXISTS qm",
    "CREATE TABLE qm(v DECIMAL(3,1))",
    "INSERT INTO qm VALUES (1.0),(2.1),(4.1),(9.9)",
    "DROP TABLE IF EXISTS q52",
    "CREATE TABLE q52(v DECIMAL(5,2))",
    "INSERT INTO q52 VALUES (1.00),(2.50),(3.50),(4.00)",
]
for _s in DDL:
    eng.execute(_s)
    con.execute(_s)

ORDERED = [
    "SELECT quantile_cont(v, 0.25) AS q FROM qd",   # 15.5 -> 1.5 (BROUND gave 1.6)
    "SELECT quantile_cont(v, [0.25, 0.75]) AS q FROM qd",
    "SELECT quantile_cont(v, 0.25) AS q FROM qn",   # trunc toward zero: -3.5
    "SELECT quantile_cont(v, 0.75) AS q FROM qn",   # -15.5 -> -1.5
    "SELECT quantile_cont(v, 0.5) AS q FROM q52",   # r12 sweep value 2.12
    "SELECT mad(v) AS m FROM qd",
    "SELECT mad(v) AS m FROM qm",                   # dev median 15.5 -> 1.5
    "SELECT median(v) AS m FROM qd",
    "SELECT median(v) AS m FROM qm",
    # composite-branch over ordered stat (pass-composition check)
    "SELECT COALESCE(quantile_disc(v, 0.5), '0.0') AS q FROM qd",
]
batch(ORDERED)
