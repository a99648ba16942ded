"""Hand-run the driver's correctness gate: every queries() entry at sf0.01
vs its oracle_sql() in DuckDB (order-insensitive, columns sorted by name).

Usage: python scripts/verify_parity.py [query ...]   (default: all)
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from atiesh_spark import get_spark  # noqa: E402
from atiesh_spark.plans.registry import mean_of_rounded_violations  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return round(v, 6)
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    spark = get_spark(app_name="verify_parity", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    df = e.entry(spark)
    print(f"entry: {df.count()} rows, schema {df.schema.simpleString()}", flush=True)

    qs, oracles = e.queries(), e.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failed = []
    for name in wanted:
        sdf = qs[name](spark, SF_DIR)
        srows = canon([tuple(r) for r in sdf.collect()], sdf.columns)
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)})", flush=True)
            continue
        # Canon rule 2 (registry.py): AVG of per-row-ROUND()ed values can
        # land on a .00005 boundary where the engines round apart (q188).
        rounded_means = mean_of_rounded_violations(oracles[name])
        if rounded_means:
            failed.append(name)
            print(
                f"{name}: ORACLE CANON ERROR — AVG over ROUND()ed values "
                f"{rounded_means}; output the SUM instead "
                "(registry.py canonicalization rule 2)",
                flush=True,
            )
            continue
        res = con.sql(oracles[name])
        # The driver's hasher serializes DuckDB HUGEINT (INT128, from any
        # uncast integer SUM) differently from BIGINT even when values are
        # identical — the Python-side canon below can't see the type, so
        # check dtypes explicitly (q131/q135/q140 lesson, round 5).
        bad_types = [
            (c, str(t)) for c, t in zip(res.columns, res.types)
            if str(t) in ("HUGEINT", "INT128", "UHUGEINT")
        ]
        if bad_types:
            failed.append(name)
            print(
                f"{name}: ORACLE TYPE ERROR — HUGEINT columns {bad_types}; "
                "CAST the SUM to BIGINT (registry.py canonicalization rule)",
                flush=True,
            )
            continue
        drows = canon(res.fetchall(), res.columns)
        ok = srows == drows
        if not ok:
            failed.append(name)
            diff = next(
                (i for i, (a, b) in enumerate(zip(srows, drows)) if a != b),
                min(len(srows), len(drows)),
            )
            print(
                f"{name}: MISMATCH spark={len(srows)} duck={len(drows)} "
                f"first-diff@{diff}: "
                f"{srows[diff] if diff < len(srows) else '<none>'} vs "
                f"{drows[diff] if diff < len(drows) else '<none>'}",
                flush=True,
            )
        else:
            print(f"{name}: MATCH ({len(srows)} rows)", flush=True)
    print(f"\n{len(wanted) - len(failed)}/{len(wanted)} match; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
