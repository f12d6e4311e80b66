"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, then compares row count, schema width,
and the order-insensitive multiset of values (columns sorted by
name, floats compared exactly after the query's own rounding).

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "item"):
        return norm_cell(v.item())
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from katta_spark.session import get_spark

    spark = get_spark("check_contract", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:24s} rows={len(s_rows):6d}  (rows-only, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0].lower() for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ORACLE SQL ERROR: {exc}")
            continue
        ok_schema = sorted(s_cols) == sorted(o_cols)
        a, b = norm_rows(s_cols, s_rows), norm_rows(o_cols, o_rows)
        ok_rows = a == b
        status = "OK" if (ok_schema and ok_rows) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{name:24s} {status}  spark={len(s_rows)} duck={len(o_rows)} schema={ok_schema}")
        if not ok_rows and len(a) == len(b):
            for x, y in zip(a, b):
                if x != y:
                    print(f"   spark {x}\n   duck  {y}")
                    break
        elif not ok_rows:
            sa, sb = set(a), set(b)
            print(f"   only-spark: {list(sa - sb)[:3]}")
            print(f"   only-duck : {list(sb - sa)[:3]}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
