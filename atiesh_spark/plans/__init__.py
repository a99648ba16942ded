from atiesh_spark.plans.registry import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
