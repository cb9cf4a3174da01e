"""DML layer: INSERT append, UPDATE/DELETE copy-on-write, constraint
enforcement (SURVEY §7.5).

rows_affected semantics match db/db.go:57-62 (count of rows the statement
changed). Constraint violations surface as raised errors → the HTTP layer's
{"error": ...} envelope, the same behavior the reference shows for DuckDB
errors (http/service.go:236-237).

Scale: INSERT appends parquet files (no read of existing data except the PK
anti-join); UPDATE/DELETE rewrite only because parquet is immutable — the
rewrite is a full-scan copy-on-write, the documented cost (SURVEY §7.4 item
1). PK checks are an aggregate + broadcast-able anti-join, not a collect.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dialect import translate

if TYPE_CHECKING:
    from .executor import Engine


class ConstraintViolation(Exception):
    pass


def split_top_level(body: str) -> list[str]:
    """Split a comma-separated SQL fragment list (CREATE TABLE columns,
    UPDATE SET assignments) on top-level commas — paren-depth and
    string-literal aware so `greatest(b, c)` and `'a,b'` stay intact."""
    parts, depth, cur, in_str = [], 0, [], False
    i = 0
    while i < len(body):
        ch = body[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(body) and body[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _check_constraints(engine: "Engine", table: str, incoming: DataFrame) -> None:
    meta = engine.catalog.tables[table]
    for col in meta.not_null_cols:
        n_null = incoming.filter(F.col(col).isNull()).limit(1).count()
        if n_null:
            raise ConstraintViolation(f"NOT NULL constraint failed: {table}.{col}")
    pk = meta.pk_cols
    if pk:
        n_in = incoming.count()
        if incoming.dropDuplicates(pk).count() != n_in:
            raise ConstraintViolation(f"duplicate key in inserted rows for PRIMARY KEY ({', '.join(pk)})")
        existing = engine.catalog.read(table).select(*pk)
        clash = incoming.select(*pk).join(existing, pk, "left_semi").limit(1).count()
        if clash:
            raise ConstraintViolation(
                f"PRIMARY KEY constraint failed: {table} ({', '.join(pk)})"
            )


_INSERT_VALUES_RE = re.compile(
    r"^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(VALUES\s*.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT_RE = re.compile(
    r"^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(SELECT\s+.+|WITH\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _aligned(engine: "Engine", table: str, cols_spec: str | None, src: DataFrame) -> DataFrame:
    meta = engine.catalog.tables[table]
    schema = meta.spark_schema()
    target_cols = [c["name"] for c in meta.columns]
    src_cols = (
        [c.strip() for c in cols_spec.split(",")] if cols_spec else target_cols[: len(src.columns)]
    )
    if len(src.columns) != len(src_cols):
        raise ValueError(
            f"INSERT column count mismatch: {len(src.columns)} values for {len(src_cols)} columns"
        )
    renamed = src.toDF(*src_cols)
    out = renamed
    for name in target_cols:
        field = schema[name]
        if name in src_cols:
            out = out.withColumn(name, F.col(name).cast(field.dataType))
        else:
            out = out.withColumn(name, F.lit(None).cast(field.dataType))
    return out.select(*target_cols)


def insert_values(engine: "Engine", sql: str) -> int:
    m = _INSERT_VALUES_RE.match(sql.strip())
    if not m:
        raise ValueError(f"cannot parse INSERT: {sql[:80]}")
    table, cols_spec, values_clause = m.groups()
    src = engine.spark.sql(f"SELECT * FROM ({translate(values_clause)})")
    aligned = _aligned(engine, table, cols_spec, src)
    _check_constraints(engine, table, aligned)
    n = aligned.count()
    engine.catalog.append(table, aligned)
    return n


def insert_select(engine: "Engine", sql: str) -> int:
    m = _INSERT_SELECT_RE.match(sql.strip())
    if not m:
        raise ValueError(f"cannot parse INSERT ... SELECT: {sql[:80]}")
    table, cols_spec, select_sql = m.groups()
    src = engine.spark.sql(translate(select_sql))
    aligned = _aligned(engine, table, cols_spec, src)
    _check_constraints(engine, table, aligned)
    n = aligned.count()
    engine.catalog.append(table, aligned)
    return n


_UPDATE_RE = re.compile(
    r"^UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?$", re.IGNORECASE | re.DOTALL
)


def update_rows(engine: "Engine", sql: str) -> int:
    m = _UPDATE_RE.match(sql.strip())
    if not m:
        raise ValueError(f"cannot parse UPDATE: {sql[:80]}")
    table, set_clause, where = m.groups()
    df = engine.catalog.read(table)
    pred = F.expr(translate(where)) if where else F.lit(True)
    n = df.filter(pred).count()
    assignments = {}
    for part in split_top_level(set_clause):
        if "=" not in part:
            raise ValueError(f"cannot parse UPDATE assignment (missing '='): {part!r}")
        col, expr = part.split("=", 1)
        assignments[col.strip()] = F.expr(translate(expr.strip()))
    out = df
    for col, expr in assignments.items():
        field = engine.catalog.tables[table].spark_schema()[col]
        out = out.withColumn(
            col, F.when(pred, expr.cast(field.dataType)).otherwise(F.col(col))
        )
    _check_constraints_update(engine, table, out)
    engine.catalog.overwrite(table, out)
    return n


def _check_constraints_update(engine: "Engine", table: str, updated: DataFrame) -> None:
    meta = engine.catalog.tables[table]
    for col in meta.not_null_cols:
        if updated.filter(F.col(col).isNull()).limit(1).count():
            raise ConstraintViolation(f"NOT NULL constraint failed: {table}.{col}")
    pk = meta.pk_cols
    if pk and updated.groupBy(*pk).count().filter(F.col("count") > 1).limit(1).count():
        raise ConstraintViolation(f"PRIMARY KEY constraint failed: {table} ({', '.join(pk)})")


_DELETE_RE = re.compile(r"^DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+))?$", re.IGNORECASE | re.DOTALL)


def delete_rows(engine: "Engine", sql: str) -> int:
    m = _DELETE_RE.match(sql.strip())
    if not m:
        raise ValueError(f"cannot parse DELETE: {sql[:80]}")
    table, where = m.groups()
    df = engine.catalog.read(table)
    pred = F.expr(translate(where)) if where else F.lit(True)
    n = df.filter(pred).count()
    # SQL three-valued logic: DELETE removes only rows where the predicate is
    # TRUE; rows where it evaluates NULL are retained (filter(~pred) would
    # silently drop them).
    engine.catalog.overwrite(table, df.filter(~F.coalesce(pred, F.lit(False))))
    return n
