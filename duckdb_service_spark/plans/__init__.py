from .registry import BENCH, ORACLES, QUERIES, load_all, query

__all__ = ["QUERIES", "ORACLES", "BENCH", "query", "load_all"]
