from atiesh_spark.streaming.interceptors import build_interceptor_chain
from atiesh_spark.streaming.sinks import build_sink_writer
from atiesh_spark.streaming.sources import build_source

__all__ = ["build_source", "build_interceptor_chain", "build_sink_writer"]
