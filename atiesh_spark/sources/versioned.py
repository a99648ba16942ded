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

FORMAT STAMPING (round 14): stores whose rows are derived under a hash
family or signature layout (MinHash band signatures, winnowing
fingerprints, ANN hyperplane buckets, BM25/positional postings) are
silently poisoned by a family change — e.g. the r13 md5-hex ->
md5_long MinHash migration makes old and new band signatures NEVER
collide, so an incremental dedup pipeline joining a pre-migration
store "works" while finding zero duplicates. ``format_tag`` makes
that loud: the first write stamps ``<path>/_FORMAT``; every
subsequent open (read or write) of a non-empty store must present the
identical tag or it raises, naming both tags and demanding a rebuild.
A non-empty store WITHOUT a marker is treated as pre-stamping legacy
state and also refused — absence of evidence is exactly the
pre-migration case the guard exists for.

Used by ``operators/rollup.StreamingCascadeRollup`` (continuous
aggregates), ``operators/diffing.StreamingScd2`` (dimension
maintenance) and ``operators/sampling.StreamingWeightedSample``
(streaming reservoir); the signature-bearing loops
(``similarity.StreamingAnnIndex``, ``textstats.StreamingWinnowIndex``,
``retrieval.StreamingBm25Index`` / ``StreamingPositionalIndex``) pass
``format_tag``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


class StoreFormatError(ValueError):
    """A versioned store's persisted format does not match the format
    this code expects — joining across the mismatch would silently
    produce wrong (typically empty) results, so loading refuses."""


class VersionedStore:
    MARKER = "_FORMAT"

    def __init__(
        self, path: str, keep_versions: int = 2, format_tag: str | None = None
    ) -> None:
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        if format_tag is not None and "\n" in format_tag:
            raise ValueError("format_tag must be a single line")
        self.path = path.rstrip("/")
        self.keep_versions = keep_versions
        self.format_tag = format_tag

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

    # -- format marker ---------------------------------------------------
    def _marker_path(self, spark: SparkSession):
        return spark._jvm.org.apache.hadoop.fs.Path(f"{self.path}/{self.MARKER}")

    def stored_format(self, spark: SparkSession) -> str | None:
        """The tag stamped into the store, or None if unstamped."""
        fs, _ = _hadoop_path(spark, self.path)
        mp = self._marker_path(spark)
        if not fs.exists(mp):
            return None
        stream = fs.open(mp)
        try:
            buf = bytearray()
            while len(buf) < 4096:  # tags are one short line
                b = stream.read()
                if b < 0:
                    break
                buf.append(b)
        finally:
            stream.close()
        return bytes(buf).decode("utf-8").strip()

    def _stamp_format(self, spark: SparkSession) -> None:
        fs, _ = _hadoop_path(spark, self.path)
        stream = fs.create(self._marker_path(spark), True)
        try:
            stream.write(bytearray((self.format_tag + "\n").encode("utf-8")))
        finally:
            stream.close()

    def _check_format(self, spark: SparkSession, writing: bool) -> None:
        """Enforce the format contract against a NON-EMPTY store.

        Callers gate on ``versions()`` being non-empty first: an empty
        (or absent) store has no state to mismatch, and on the write
        path it is stamped fresh.
        """
        if self.format_tag is None:
            return
        stored = self.stored_format(spark)
        if stored == self.format_tag:
            return
        verb = "writing to" if writing else "reading"
        if stored is None:
            raise StoreFormatError(
                f"versioned store {self.path} has persisted state but no "
                f"{self.MARKER} stamp; this code expects format "
                f"{self.format_tag!r}. The store predates format stamping "
                f"(e.g. pre-migration signatures that would silently match "
                f"nothing) — rebuild it, or stamp it explicitly after "
                f"verifying the format by hand."
            )
        raise StoreFormatError(
            f"versioned store {self.path} is stamped {stored!r} but this "
            f"code expects {self.format_tag!r}; joining across the "
            f"mismatch would silently produce wrong results — rebuild the "
            f"store under the new format."
        )

    # -- reads / writes --------------------------------------------------
    def latest_path(self, spark: SparkSession, before: int | None = None) -> str | None:
        vs = [v for v in self.versions(spark) if before is None or v < before]
        return f"{self.path}/v{vs[-1]}" if vs else None

    def read(self, spark: SparkSession) -> DataFrame:
        latest = self.latest_path(spark)
        if latest is None:
            raise FileNotFoundError(f"no versions under {self.path}")
        self._check_format(spark, writing=False)
        return spark.read.parquet(latest)

    def read_before(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        prev = self.latest_path(spark, before=batch_id)
        if prev is None:
            return None
        self._check_format(spark, writing=False)
        return spark.read.parquet(prev)

    def write(self, df: DataFrame, batch_id: int) -> None:
        """Overwrite ``v{batch_id}`` with ``df`` and prune old versions."""
        spark = df.sparkSession
        if self.format_tag is not None:
            if self.versions(spark):
                self._check_format(spark, writing=True)
            else:
                self._stamp_format(spark)
        df.write.mode("overwrite").parquet(f"{self.path}/v{batch_id}")
        self._prune(spark, upto=batch_id)

    def _prune(self, spark: SparkSession, upto: int) -> None:
        vs = [v for v in self.versions(spark) if v <= upto]
        fs, _ = _hadoop_path(spark, self.path)
        jvm = spark._jvm
        for v in vs[: -self.keep_versions]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{self.path}/v{v}"), True)
