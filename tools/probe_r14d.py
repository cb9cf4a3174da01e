"""Trace the routing passes for a failing shape."""

from duckdb_service_spark.service.dialect import translate
from duckdb_service_spark.service.sql_routing import (
    rewrite_branch_expr_types,
    rewrite_string_list_casts,
)

Q = "SELECT (CASE WHEN 1=1 THEN CAST(NULL AS INTEGER[]) ELSE '[4]' END)[1] AS v"
s1 = rewrite_branch_expr_types(spark, Q, translate)
print("after branch:", s1)
s2 = rewrite_string_list_casts(spark, s1, translate)
print("after listcast:", s2)
print("translated:", translate(s2)[:600])
