"""Connected components over an edge list — the cluster-resolution step a
large-scale dedup pipeline needs between "verified near-dup pairs" and
"which docs to keep/drop" (pairs alone under-delete: if A~B and B~C but the
pair A~C was never generated, dropping "the larger of each pair" can drop B
twice and keep both A and C; clustering first makes the keep-policy exact).

Algorithm: alternating large-star / small-star contractions (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", ACM SoCC'14). Converges in O(log n) rounds vs
O(diameter) for naive label propagation. Both steps here are pure
groupBy-min + join compositions over the edge list:

- NO ``collect_list`` adjacency — a template doc with 10^6 near-dups (real
  web corpora have these) would overflow any in-memory neighbor list; the
  min-aggregate + join formulation is hub-safe because the hot key is
  handled by AQE skew-split like any other skewed aggregation.
- NO driver-side graph — edges never leave the cluster; per-round
  convergence check ships back ONE row (count + xxhash64 checksum).
- Lineage is cut each round with ``localCheckpoint`` so the iterated plan
  doesn't grow superlinearly (same pattern as operators/recursive.py).

Reference parity note: the reference service (NamanMahor/duckdb-service)
has no graph operator — this is part of the LLM-data-pipeline extension
surface (dedup cluster resolution), kept oracle-checkable via a recursive
transitive-closure twin in DuckDB SQL (plans/graphs.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (src=lo, dst=hi), self-loops dropped,
    deduped. All algorithm invariants below rely on src < dst."""
    lo = F.least(F.col("src"), F.col("dst"))
    hi = F.greatest(F.col("src"), F.col("dst"))
    return (
        edges.select(lo.alias("src"), hi.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Emitting (v, m(u)) for v ∈ N(u), v > u covers each undirected edge
    exactly once (from its smaller endpoint's group) and provably preserves
    connectivity (SoCC'14 Lemma 1) while strictly decreasing large node ids'
    attachment points.
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bidir = fwd.unionByName(rev)  # row = (u, one neighbor v)
    m = bidir.groupBy("src").agg(F.min("dst").alias("__mn"))
    m = m.select("src", F.least(F.col("__mn"), F.col("src")).alias("__m"))
    out = (
        bidir.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge large→small, then connect every small neighbor of u
    (and u itself) to m(u) = min(N_small(u))."""
    e = edges.select(
        F.greatest(F.col("src"), F.col("dst")).alias("src"),
        F.least(F.col("src"), F.col("dst")).alias("dst"),
    )
    m = e.groupBy("src").agg(F.min("dst").alias("__m"))
    neigh = (
        e.join(m, "src")
        .filter(F.col("dst") != F.col("__m"))
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
    )
    self_edge = m.select(F.col("src"), F.col("__m").alias("dst"))
    return _canon(neigh.unionByName(self_edge))


def _fingerprint(edges: DataFrame) -> tuple:
    """One-row convergence probe: (edge count, order-insensitive checksum)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(F.col("src"), F.col("dst"))).alias("chk"),
    ).first()
    return (row["n"], row["chk"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: Optional[DataFrame] = None,
    max_iter: int = 30,
) -> DataFrame:
    """Return (node, component) with component = min node id in the node's
    connected component.

    ``edges``: any two-column relation of undirected edges (longs).
    ``nodes``: optional one-column relation of ALL node ids — isolated nodes
    (no incident edge) come back as their own singleton component. Without
    it only nodes present in ``edges`` appear.
    ``max_iter`` is a hard guard; the alternation converges in O(log n)
    rounds (20 handles ~10^6-node components; 30 is far past any real
    corpus). Non-convergence raises instead of returning partial clusters.
    """
    cur = _canon(
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
    ).localCheckpoint(eager=True)
    fp = _fingerprint(cur)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        cur = nxt
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # Fixpoint edge set is a union of stars centered at each component's
    # minimum: (src=rep, dst=member).
    members = cur.select(F.col("dst").alias("node"), F.col("src").alias("component"))
    reps = cur.select(F.col("src").alias("node"), F.col("src").alias("component")).distinct()
    out = members.unionByName(reps).distinct()

    if nodes is not None:
        ncol = nodes.columns[0]
        allnodes = nodes.select(F.col(ncol).cast("long").alias("node")).distinct()
        out = allnodes.join(out, "node", "left").select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
        )
    return out
