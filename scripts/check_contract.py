"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query on Spark and its oracle SQL on DuckDB
at the given sf dir, compares row count, column names, and
order-insensitive values. Usage:

    python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from planar_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {exc}")
            failures += 1
            continue
        if sql is None:
            print(f"[weak] {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = [dict(zip(ocols, r)) for r in ores.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {exc}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"[FAIL] {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"[FAIL] {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                print(f"[FAIL] {name}: value mismatch, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"[ OK ] {name}: rows={len(srows)}")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
