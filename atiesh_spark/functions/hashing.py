"""Shared md5 -> integer conversion.

The engine's determinism story (oracle-checkable hashes, cluster-stable
bucketing) rests on one trick: md5 the value, take a hex prefix, parse
it as an integer. Exactly ONE implementation lives here — the DuckDB
oracle fragments mirror it as ('0x' || substring(md5(x), 1, N))::BIGINT,
and any change to digest width must happen in both places at once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative long.

    hex_chars <= 15 keeps the value under 2^60, safely inside a signed
    64-bit long.
    """
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in [1, 15] to fit a signed long")
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, hex_chars), 16, 10
    ).cast("long")
