from .registry import QUERIES, Query, all_queries, all_oracles, query

__all__ = ["QUERIES", "Query", "all_queries", "all_oracles", "query"]
