from __future__ import annotations

import duckdb
import pytest

from atiesh_spark.session import get_spark
from atiesh_spark.sources.tables import TABLES

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os
    cpus = int(os.environ.get("ATIESH_TEST_CPUS", "8"))
    s = get_spark(
        app_name="atiesh-spark-tests", cpus=cpus, shuffle_partitions=cpus
    )
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="session")
def duck_small():
    return make_duck(SF_SMALL)
