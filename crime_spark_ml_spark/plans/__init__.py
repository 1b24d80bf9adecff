from .registry import QuerySpec, all_oracles, all_queries, load_all_plans, register

__all__ = ["QuerySpec", "all_oracles", "all_queries", "load_all_plans", "register"]
