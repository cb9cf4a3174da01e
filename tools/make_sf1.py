"""Generate an sf1 dataset (~10x sf0.1) for the one-off floor-amortization
spot-run (VERDICT r10 task 7) by replicating /root/testdata/sf0.1 ten times
with key offsets. Writes to $SPARK_GRAFT_SF1_DIR (default /root/repo/.sf1,
gitignored). /root/testdata is read-only and untouched.

Replication rules (referential integrity preserved):
- region/nation: fixed dims, copied as-is.
- customer/supplier/part: keys offset by replica * base-table cardinality.
- orders: o_orderkey and o_custkey offset consistently.
- lineitem: l_orderkey/l_partkey/l_suppkey offset consistently.
- events: event_id and user_id offset (user population scales 10x too, so
  per-user density — what sessionization/funnel cost depends on — holds).
- documents: doc_id offset AND every word suffixed with a replica tag for
  replicas 1-9 — naive copies would make each doc a 10-way exact duplicate,
  turning the LSH candidate space quadratic in the replica count; the
  per-word suffix keeps cross-replica shingle sets disjoint so near-dup
  mass (each doc's in-query twin) scales LINEARLY, like a real corpus.
  doc_id stays below the dedup twin offset (100000) at sf1.
- embeddings: vec_id offset, vectors copied (timing only; sf1 is never
  value-compared).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))

# base-table cardinalities at sf0.1 (TESTDATA.md); offsets use these so key
# ranges of consecutive replicas never overlap
CARD = {
    "customer": 15000,
    "supplier": 1000,
    "part": 20000,
    "orders": 150000,
    "lineitem": 600000,
    "events": 100000,
    "documents": 5000,
    "embeddings": 2000,
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, select_per_replica: str) -> None:
        parts = [
            select_per_replica.format(i=i, **CARD) for i in range(REPLICAS)
        ]
        union = "\nUNION ALL\n".join(parts)
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", file=sys.stderr)

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied", file=sys.stderr)

    write(
        "customer",
        f"SELECT c_custkey + {{i}} * {{customer}} AS c_custkey, c_name,"
        f" c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + {{i}} * {{supplier}} AS s_suppkey, s_name,"
        f" s_nationkey, s_acctbal FROM {src('supplier')}",
    )
    write(
        "part",
        f"SELECT p_partkey + {{i}} * {{part}} AS p_partkey, p_name, p_brand,"
        f" p_type, p_size, p_retailprice FROM {src('part')}",
    )
    write(
        "orders",
        f"SELECT o_orderkey + {{i}} * {{orders}} AS o_orderkey,"
        f" o_custkey + {{i}} * {{customer}} AS o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + {{i}} * {{orders}} AS l_orderkey,"
        f" l_partkey + {{i}} * {{part}} AS l_partkey,"
        f" l_suppkey + {{i}} * {{supplier}} AS l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}",
    )
    write(
        "events",
        f"SELECT event_id + {{i}} * {{events}} AS event_id, ts,"
        f" user_id + {{i}} * (SELECT max(user_id) + 1 FROM {src('events')})"
        f" AS user_id, event_type, value, props FROM {src('events')}",
    )
    write(
        "documents",
        f"SELECT doc_id + {{i}} * {{documents}} AS doc_id,"
        f" CASE WHEN {{i}} = 0 THEN text"
        f" ELSE regexp_replace(text, '(\\S+)', '\\1q{{i}}', 'g') END AS text,"
        f" lang, source,"
        f" CASE WHEN {{i}} = 0 THEN n_chars"
        f" ELSE length(regexp_replace(text, '(\\S+)', '\\1q{{i}}', 'g'))"
        f" END AS n_chars FROM {src('documents')}",
    )
    write(
        "embeddings",
        f"SELECT vec_id + {{i}} * {{embeddings}} AS vec_id, embedding, label"
        f" FROM {src('embeddings')}",
    )


if __name__ == "__main__":
    main()
