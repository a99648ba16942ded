from atiesh_spark.plans.registry import DRIVER_ORDER, QUERIES, QuerySpec, ordered_queries

__all__ = ["DRIVER_ORDER", "QUERIES", "QuerySpec", "ordered_queries"]
