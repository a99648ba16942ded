"""Custom stateful streaming operators (applyInPandasWithState).

stateful_count_batcher gives EXACT parity for the reference's
BatchSinkSemantics (BatchSinkSemantics.scala:25-39,155-214): per-tag
buffers flushed when they reach `batch-size` OR when `batch-timeout`
(processing-time) fires — the two flush paths the micro-batch trigger
alone cannot reproduce exactly (SURVEY.md §7.4 "count-based flush").

State per tag: the buffered values. Emitted rows: one per flushed batch,
(tag, body, n_events, flush_reason) with the newline body join of
HttpSink.scala:151-154. Like the reference, size 1 and size=0 with
timeout=0 are rejected at build time (BatchSinkSemantics.scala:135-146).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BATCH_OUTPUT_SCHEMA = StructType(
    [
        StructField("tag", StringType()),
        StructField("body", StringType()),
        StructField("n_events", IntegerType()),
        StructField("flush_reason", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("buffered", ArrayType(StringType())), StructField("opened_at", LongType())]
)


def _make_batcher(batch_size: int, timeout_ms: int):
    def batch_fn(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import time as _time

        tag = key[0]
        buffered, opened_at = (
            (list(state.get[0]), state.get[1]) if state.exists else ([], None)
        )
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            # timeout flush (BatchSinkSemantics.scala:164-171)
            if buffered:
                out.append(
                    {"tag": tag, "body": "\n".join(buffered),
                     "n_events": len(buffered), "flush_reason": "timeout"}
                )
            state.remove()
        else:
            for pdf in pdfs:
                buffered.extend(pdf["value"].astype(str).tolist())
            # size flush, possibly multiple full batches per trigger
            while batch_size > 0 and len(buffered) >= batch_size:
                chunk, buffered = buffered[:batch_size], buffered[batch_size:]
                out.append(
                    {"tag": tag, "body": "\n".join(chunk),
                     "n_events": len(chunk), "flush_reason": "size"}
                )
                opened_at = None  # a size flush closes the open buffer
            if buffered:
                now_ms = int(_time.time() * 1000)
                if opened_at is None or opened_at == 0:
                    opened_at = now_ms  # buffer (re)opened this trigger
                state.update((buffered, opened_at))
                if timeout_ms > 0:
                    # anchor to buffer-open time: re-arming happens every
                    # trigger (GroupState clears the timer on invocation),
                    # but always with the REMAINING time, so a steady
                    # trickle cannot postpone the flush forever
                    remaining = max(timeout_ms - (now_ms - opened_at), 1)
                    state.setTimeoutDuration(int(remaining))
            elif state.exists:
                state.remove()

        yield pd.DataFrame(out, columns=["tag", "body", "n_events", "flush_reason"])

    return batch_fn


def stateful_count_batcher(
    events: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    batch_size: int = 0,
    timeout_ms: int = 0,
) -> DataFrame:
    """Per-tag count/timeout batch assembly on a streaming DataFrame.

    Validation mirrors the reference init errors
    (BatchSinkSemantics.scala:135-146).
    """
    if batch_size == 1:
        raise ValueError("batch_size 1 is rejected (use the plain sink path)")
    if batch_size <= 0 and timeout_ms <= 0:
        raise ValueError("need batch_size > 1 and/or timeout_ms > 0")
    shaped = events.select(
        F.col(tag_col).cast("string").alias("tag"),
        F.col(value_col).cast("string").alias("value"),
    )
    return shaped.groupBy("tag").applyInPandasWithState(
        _make_batcher(batch_size, timeout_ms),
        outputStructType=BATCH_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


class _CountBatchProcessor:
    """transformWithState processor for the count/timeout batcher.

    The Spark 4 successor to applyInPandasWithState: typed state
    primitives (ListState for the buffer, ValueState for the open
    timestamp) and EXPLICIT absolute-time timers — the timeout anchor is
    registered once when a buffer opens (opened_at + timeout), so a
    steady trickle of events cannot postpone the flush (the GroupState
    version must re-derive the remaining time every trigger instead).
    Same output contract as ``stateful_count_batcher``.
    """

    def __init__(self, batch_size: int, timeout_ms: int) -> None:
        self.batch_size = batch_size
        self.timeout_ms = timeout_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._buf = handle.getListState("buffered", "value STRING")
        self._opened = handle.getValueState("opened_at", "ts LONG")

    def _flush_rows(self, tag: str, chunk: list[str], reason: str) -> pd.DataFrame:
        return pd.DataFrame(
            [{"tag": tag, "body": "\n".join(chunk),
              "n_events": len(chunk), "flush_reason": reason}],
            columns=["tag", "body", "n_events", "flush_reason"],
        )

    def _disarm(self) -> None:
        for expiry in list(self._handle.listTimers()):
            self._handle.deleteTimer(expiry)

    def handleInputRows(self, key, rows, timerValues):
        tag = key[0]
        buffered = [r[0] for r in self._buf.get()]
        for pdf in rows:
            buffered.extend(pdf["value"].astype(str).tolist())
        while self.batch_size > 0 and len(buffered) >= self.batch_size:
            chunk, buffered = buffered[: self.batch_size], buffered[self.batch_size :]
            yield self._flush_rows(tag, chunk, "size")
            # a size flush closes the open buffer: the next leftover
            # re-opens it (and re-anchors the timeout) below
            self._opened.clear()
            self._disarm()
        if buffered:
            self._buf.clear()
            self._buf.put([(v,) for v in buffered])
            if not self._opened.exists():
                now_ms = timerValues.getCurrentProcessingTimeInMs()
                self._opened.update((now_ms,))
                if self.timeout_ms > 0:
                    # one absolute timer per open buffer — no per-trigger
                    # re-arming, trickle-proof by construction
                    self._handle.registerTimer(now_ms + self.timeout_ms)
        else:
            self._buf.clear()
            self._opened.clear()
            self._disarm()

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        tag = key[0]
        buffered = [r[0] for r in self._buf.get()]
        if buffered:
            yield self._flush_rows(tag, buffered, "timeout")
        self._buf.clear()
        self._opened.clear()

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass  # no initial state seeding for the batcher

    def close(self) -> None:
        pass


def stateful_count_batcher_tws(
    events: DataFrame,
    tag_col: str = "tag",
    value_col: str = "value",
    batch_size: int = 0,
    timeout_ms: int = 0,
) -> DataFrame:
    """``stateful_count_batcher`` on the Spark 4 transformWithState API.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState does
    not run on the default HDFS-backed store — and the ``protobuf``
    package (the state-server wire protocol; absent in this container,
    so the runtime path raises a clear error here and is covered by the
    processor-level unit tests instead). Validation mirrors
    BatchSinkSemantics.scala:135-146.
    """
    if batch_size == 1:
        raise ValueError("batch_size 1 is rejected (use the plain sink path)")
    if batch_size <= 0 and timeout_ms <= 0:
        raise ValueError("need batch_size > 1 and/or timeout_ms > 0")
    try:
        import google.protobuf  # noqa: F401  (transformWithState wire protocol)
    except ImportError as exc:
        raise RuntimeError(
            "stateful_count_batcher_tws needs the protobuf package "
            "(transformWithState state-server protocol); use "
            "stateful_count_batcher (applyInPandasWithState) where "
            "protobuf is unavailable"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so importing this module never hard-depends
    # on the Spark 4 API surface at definition time
    proc_cls = type(
        "CountBatchProcessor", (_CountBatchProcessor, StatefulProcessor), {}
    )
    shaped = events.select(
        F.col(tag_col).cast("string").alias("tag"),
        F.col(value_col).cast("string").alias("value"),
    )
    return shaped.groupBy("tag").transformWithStateInPandas(
        statefulProcessor=proc_cls(batch_size, timeout_ms),
        outputStructType=BATCH_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming exact deduplication on key columns.

    With ``ts_col`` + ``watermark_delay``, state is bounded: duplicates
    arriving within the watermark horizon are dropped and older state is
    evicted (dropDuplicatesWithinWatermark) — the only sane shape at
    100 TB. Without a watermark, state grows forever (small keyspaces
    only); offered because the reference-style pipelines may lack event
    time entirely.
    """
    if ts_col is not None and watermark_delay is not None:
        return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def with_watermark_window(
    events: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts — the late-data policy the
    reference never had (SURVEY.md §2.7).

    Contract (Spark split watermarks, SPARK-24634): window state is
    EVICTED and emitted (append mode) once the eviction watermark passes
    the window end; input rows are DROPPED as late against the previous
    batch's eviction watermark — so a closed window is emitted exactly
    once and never re-opened, but a row arriving in the same batch that
    closes its window still counts."""
    gcols = group_cols or []
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *gcols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), *gcols, "cnt")
    )
