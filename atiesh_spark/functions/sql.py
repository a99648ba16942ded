"""SQL-surface registration: expose the engine's scalar helpers to
``spark.sql`` users.

A reference deployment's operators live behind component configs; a
Spark deployment's ad-hoc users live in SQL. Registering the non-
builtin helpers as named SQL functions lets the same cleaning
vocabulary run from a notebook or a SQL file without touching the
DataFrame API:

    register_sql_functions(spark)
    spark.sql("SELECT trim(regexp_replace(lower(atiesh_nfc(text)), "
              r"'\\s+', ' ')) FROM docs")  # == normalize_text(text)

Only functions with no JVM builtin equivalent are registered — the
codegen Column helpers (md5_long, base64 codecs, map algebra) compose
in SQL already via their underlying builtins, and wrapping them in
Python UDFs would DOWNGRADE them out of codegen. What registers here
is exactly the Arrow pandas-UDF seam: Unicode normalization and the
gzip codec pair.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def register_sql_functions(spark: SparkSession, prefix: str = "atiesh_") -> list[str]:
    """Register the engine's pandas-UDF helpers as SQL functions:
    ``{prefix}nfc`` / ``{prefix}nfkc`` (Unicode normalization — compose
    with builtin lower/regexp_replace for the full q114 contract) and
    ``{prefix}gzip`` / ``{prefix}gunzip``. Returns the registered
    names. Idempotent: re-registration replaces.
    """

    @pandas_udf("string")
    def _norm_nfc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    @pandas_udf("string")
    def _norm_nfkc(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else unicodedata.normalize("NFKC", t)
        )

    from atiesh_spark.functions.codec import gzip_compress, gzip_decompress

    names = []
    for name, fn in [
        (f"{prefix}nfc", _norm_nfc),
        (f"{prefix}nfkc", _norm_nfkc),
        (f"{prefix}gzip", gzip_compress),
        (f"{prefix}gunzip", gzip_decompress),
    ]:
        spark.udf.register(name, fn)
        names.append(name)
    return names
