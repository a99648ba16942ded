#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Materialization uses the noop sink (full execution, no driver collect) —
the honest proxy for "write the result somewhere" at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

from atiesh_spark.plans import QUERIES
from atiesh_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="atiesh-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    names = [n for n, s in QUERIES.items() if s.headline]

    # JVM/codegen warmup on the smallest table so q1 isn't charged for it.
    materialize(QUERIES["q19_topk_orders"].spark(spark, SF_DIR))

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            materialize(QUERIES[name].spark(spark, SF_DIR))
        except Exception as exc:  # isolate: one broken query must not
            errors[name] = repr(exc)  # void the whole bench record
            print(f"  {name}: ERROR {exc!r}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        record["errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    main()
