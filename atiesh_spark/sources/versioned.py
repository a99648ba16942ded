"""Versioned parquet store: the idempotent state backend for
foreachBatch maintenance loops.

One directory, one subdirectory per micro-batch (``v{batch_id}``).
Batch B reads the newest version with id < B and overwrites ``v{B}``:
a replayed batch (Structured Streaming re-runs the same batch id after
a failure) re-reads the same pre-B state and rewrites the same output,
so every maintenance loop built on this store converges to
effectively-once on top of the checkpointed source — the same contract
as ``streaming/sinks.idempotent_parquet_writer``, lifted to stateful
stores. Old versions are pruned, keeping ``keep_versions``.

Used by ``operators/rollup.StreamingCascadeRollup`` (continuous
aggregates), ``operators/diffing.StreamingScd2`` (dimension
maintenance) and ``operators/sampling.StreamingWeightedSample``
(streaming reservoir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


class VersionedStore:
    def __init__(self, path: str, keep_versions: int = 2) -> None:
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.path = path.rstrip("/")
        self.keep_versions = keep_versions

    def versions(self, spark: SparkSession) -> list[int]:
        fs, p = _hadoop_path(spark, self.path)
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def latest_path(self, spark: SparkSession, before: int | None = None) -> str | None:
        vs = [v for v in self.versions(spark) if before is None or v < before]
        return f"{self.path}/v{vs[-1]}" if vs else None

    def read(self, spark: SparkSession) -> DataFrame:
        latest = self.latest_path(spark)
        if latest is None:
            raise FileNotFoundError(f"no versions under {self.path}")
        return spark.read.parquet(latest)

    def read_before(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        prev = self.latest_path(spark, before=batch_id)
        return None if prev is None else spark.read.parquet(prev)

    def write(self, df: DataFrame, batch_id: int) -> None:
        """Overwrite ``v{batch_id}`` with ``df`` and prune old versions."""
        df.write.mode("overwrite").parquet(f"{self.path}/v{batch_id}")
        self._prune(df.sparkSession, upto=batch_id)

    def _prune(self, spark: SparkSession, upto: int) -> None:
        vs = [v for v in self.versions(spark) if v <= upto]
        fs, _ = _hadoop_path(spark, self.path)
        jvm = spark._jvm
        for v in vs[: -self.keep_versions]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{self.path}/v{v}"), True)
