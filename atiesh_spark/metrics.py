"""Pipeline metrics: the reference's Kamon counters, Spark-native.

The reference counts accepted/intercepted/discarded/submitted events per
component (SourceMetrics.scala:22-79, SinkMetrics.scala,
InterceptorMetrics.scala). Spark equivalents:

- ``with_counters`` attaches ``observe()`` aggregates to the streaming
  DataFrame — computed inside the running plan, no extra pass;
- ``CounterListener`` collects the observed values per micro-batch from
  StreamingQueryListener progress events, keyed with reference-style
  counter names.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "atiesh_counters"


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
