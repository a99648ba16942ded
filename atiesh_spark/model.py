"""Canonical event data model.

The reference's fundamental record is ``Event(payload: String, headers:
Map[String, String])`` (reference: core/.../atiesh/event/Event.scala:10-20,
SimpleEvent.scala:16-27). The Spark-native equivalent is a DataFrame with
the schema below — deliberately isomorphic to Spark's Kafka source schema
(``value`` + ``headers``), so Kafka in/out needs no adapter.

The ``Empty`` tombstone (Event.scala:25-35) has no column equivalent: a
deleted record is simply a filtered-out row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

#: value: the opaque string payload; headers: string -> string metadata.
EVENT_SCHEMA = StructType(
    [
        StructField("value", StringType(), nullable=True),
        StructField("headers", MapType(StringType(), StringType()), nullable=True),
    ]
)


def to_events(df: DataFrame, value_col: str, header_cols: dict[str, str] | None = None) -> DataFrame:
    """Project an arbitrary DataFrame into the canonical event shape.

    ``header_cols`` maps header names to source column names; values are
    stringified (headers are string->string, Event.scala:12).
    """
    headers = header_cols or {}
    pairs: list = []
    for hname, src in headers.items():
        pairs.append(F.lit(hname))
        pairs.append(F.col(src).cast("string"))
    header_expr = F.create_map(*pairs) if pairs else F.create_map()
    return df.select(
        F.col(value_col).cast("string").alias("value"),
        header_expr.alias("headers"),
    )
