from atiesh_spark.operators.batching import assemble_batches
from atiesh_spark.operators.routing import route_first_accepted

__all__ = ["assemble_batches", "route_first_accepted"]
