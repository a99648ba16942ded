"""Pipeline metrics: the reference's Kamon surface, Spark-native.

The reference exports counters AND gauges/histograms/timers per
component (Metrics.scala:26-146, SourceMetrics.scala:22-79,
SinkMetrics.scala, InterceptorMetrics.scala). Spark equivalents:

- ``with_counters`` attaches ``observe()`` aggregates to the streaming
  DataFrame — computed inside the running plan, no extra pass;
- ``CounterListener`` collects the observed values per micro-batch from
  StreamingQueryListener progress events, keyed with reference-style
  counter names;
- ``Histogram`` / ``Timer`` mirror Kamon's distribution instruments
  (power-of-two buckets, driver-side — they record per-batch scalars
  from progress events, never per-row data);
- ``MetricsListener`` extends the counter collection with
  batch-duration and rows-per-batch histograms (Kamon's
  sink.timer/histogram analog).
"""

from __future__ import annotations

import math
import time
from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "atiesh_counters"


class Histogram:
    """Kamon-style distribution: count/sum/min/max + log2 buckets.

    Buckets are labeled ``le_2^k`` (value <= 2^k): fixed memory no
    matter how many samples, good-enough resolution for latencies and
    batch sizes — the same tradeoff Kamon's HDR-backed histograms make.
    """

    def __init__(self) -> None:
        self.count = 0
        self.sum = 0.0
        self.min: float | None = None
        self.max: float | None = None
        self.buckets: dict[int, int] = defaultdict(int)

    def record(self, value: float) -> None:
        if value < 0:
            raise ValueError(f"histogram values must be >= 0, got {value}")
        self.count += 1
        self.sum += value
        self.min = value if self.min is None else min(self.min, value)
        self.max = value if self.max is None else max(self.max, value)
        # ceil first: fractional samples (timer ms) must round UP so the
        # bucket's 'value <= 2^k' contract holds (2.5 -> le_2^2, not 2^1)
        self.buckets[max(math.ceil(value) - 1, 0).bit_length()] += 1

    @property
    def mean(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def snapshot(self) -> dict:
        return {
            "count": self.count,
            "sum": self.sum,
            "min": self.min,
            "max": self.max,
            "mean": self.mean,
            "buckets": {f"le_2^{k}": v for k, v in sorted(self.buckets.items())},
        }


class Timer:
    """Kamon timer: a Histogram of elapsed milliseconds + context manager."""

    def __init__(self) -> None:
        self.histogram = Histogram()

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.histogram.record((time.perf_counter() - self._t0) * 1000.0)

    def record_ms(self, ms: float) -> None:
        self.histogram.record(ms)


def with_counters(df: DataFrame, extra: dict[str, Column] | None = None) -> DataFrame:
    """Attach reference-style counters to a (streaming) DataFrame."""
    counters = {
        "events_accepted": F.count(F.lit(1)),
        "events_with_value": F.count(F.col("value")),
    }
    for name, col in (extra or {}).items():
        counters[name] = col
    return df.observe(
        OBSERVATION_NAME, *[c.alias(n) for n, c in counters.items()]
    )


class CounterListener(StreamingQueryListener):
    """Accumulates observed counters across micro-batches."""

    def __init__(self) -> None:
        self.totals: dict[str, int] = defaultdict(int)
        self.batches = 0

    def onQueryStarted(self, event) -> None:  # pragma: no cover - callback
        pass

    def onQueryProgress(self, event) -> None:
        observed = event.progress.observedMetrics.get(OBSERVATION_NAME)
        if observed is not None:
            self.batches += 1
            for name in observed.__fields__:
                self.totals[name] += observed[name] or 0

    def onQueryIdle(self, event) -> None:  # pragma: no cover - callback
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - callback
        pass


class MetricsListener(CounterListener):
    """Counters + Kamon-style distributions from streaming progress.

    Per micro-batch records:
    - ``batch_duration_ms`` (timer): triggerExecution wall-clock — the
      reference's sink commit-timer analog;
    - ``input_rows`` (histogram): rows per batch — the queue-size /
      batch-size distribution.
    Gauges: ``last_input_rows_per_sec`` / ``last_processed_rows_per_sec``
    mirror Kamon gauges (latest value wins).
    """

    def __init__(self) -> None:
        super().__init__()
        self.batch_duration_ms = Timer()
        self.input_rows = Histogram()
        self.gauges: dict[str, float] = {}

    def onQueryProgress(self, event) -> None:
        super().onQueryProgress(event)
        p = event.progress
        duration = (p.durationMs or {}).get("triggerExecution")
        if duration is not None:
            self.batch_duration_ms.record_ms(float(duration))
        if p.numInputRows is not None:
            self.input_rows.record(int(p.numInputRows))
        if p.inputRowsPerSecond is not None:
            self.gauges["last_input_rows_per_sec"] = p.inputRowsPerSecond
        if p.processedRowsPerSecond is not None:
            self.gauges["last_processed_rows_per_sec"] = p.processedRowsPerSecond
