"""atiesh_spark — a PySpark-native analytics/stream-processing engine.

A from-scratch rebuild of the capabilities of the reference framework
`whisperaven/atiesh` (an akka-actor event mover: sources -> interceptors ->
sinks), re-expressed Spark-first:

- the Event data model (payload + string headers) becomes a canonical
  DataFrame schema (``model.py``),
- interceptors become chained column expressions (``functions/``),
- sources/sinks become ``spark.read``/``readStream`` builders and
  ``writeStream``/``foreachBatch`` writers (``sources/``, ``streaming/``),
- routing/batching semantics become declarative plans (``operators/``),
- plus the relational + LLM-pipeline query surface the reference lacks
  (``plans/queries.py``, ``operators/dedup.py`` etc.), designed for
  100 TB scale: no driver-side state, broadcast small dims, partitioned
  shuffles, built-in functions over Python UDFs.

See SURVEY.md for the full blueprint and reference citations.
"""

from atiesh_spark.session import get_spark


def boot(spark, path):
    """File-based pipeline boot (``Atiesh.main`` ≅): see
    :mod:`atiesh_spark.bootstrap`. Lazy import keeps bare
    ``import atiesh_spark`` free of streaming-module import cost."""
    from atiesh_spark.bootstrap import boot as _boot

    return _boot(spark, path)


__version__ = "0.1.0"

__all__ = ["get_spark", "boot", "__version__"]
