"""WITH RECURSIVE — driver-side fixpoint iteration (SURVEY §2.2g / §7.4).

Spark has no recursive CTE; the equivalent plan is iterate-and-union until
the step produces no new rows. Each iteration is a distributed job; only the
*emptiness check* touches the driver, so per-iteration work scales with the
cluster. The union tree is kept shallow by localCheckpoint-ing every few
rounds (breaks lineage growth, the classic iterative-algorithm trap).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_union(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    checkpoint_every: int = 8,
    distinct: bool = False,
) -> DataFrame:
    """UNION ALL semantics of WITH RECURSIVE: result = seed ∪ step(seed) ∪
    step(step(seed)) ... until a step yields zero rows. ``distinct=True``
    gives UNION (set) semantics: new rows are deduped against nothing here —
    callers wanting set semantics should make ``step`` itself anti-join
    against the accumulated frontier to guarantee termination.
    """
    acc = seed
    frontier = seed
    for i in range(max_iterations):
        frontier = step(frontier)
        if frontier.isEmpty():
            break
        acc = acc.unionByName(frontier)
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    else:
        raise RuntimeError(f"recursive_union did not converge in {max_iterations} iterations")
    return acc.distinct() if distinct else acc
