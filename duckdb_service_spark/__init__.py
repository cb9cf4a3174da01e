"""duckdb_service_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of NamanMahor/duckdb-service.

The reference (/root/reference) is a Raft-replicated HTTP front-end over an
embedded DuckDB (db/db.go:49-117 delegates every SQL statement to the DuckDB
library). Its *capability surface* is therefore (a) a small HTTP service layer
and (b) the DuckDB SQL dialect. This package re-expresses that surface
Spark-first:

- ``session``    — SparkSession factory tuned for the scale target.
- ``sources``    — parquet table registry (the test fixture star schema).
- ``plans``      — the query inventory (SURVEY.md §2.2) as DataFrame plans,
                   each paired with a DuckDB oracle SQL string.
- ``operators``  — composed operators Spark lacks natively (as-of join,
                   dedup family, similarity search, text analysis).
- ``functions``  — scalar expression helpers (portable hashing, decimal-
                   stable aggregation).
- ``service``    — HTTP layer mirroring the reference contract
                   (/db/execute /db/query /status; http/service.go:79-95).
- ``streaming``  — Structured Streaming extensions over the events table.
"""

__version__ = "0.1.0"
