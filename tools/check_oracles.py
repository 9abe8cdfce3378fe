"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(repr(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from informers_spark import get_spark

    spark = get_spark(cores=int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}"))
            print(f"FAIL {name}: spark error"); continue
        if name not in osql:
            print(f"OK(rows-only) {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCK ERROR {type(ex).__name__}: {str(ex)[:300]}"))
            print(f"FAIL {name}: duckdb error"); continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"SCHEMA: spark={scols} duck={dcols}"))
            print(f"FAIL {name}: schema"); continue
        if len(srows) != len(drows):
            failures.append((name, f"ROWS: spark={len(srows)} duck={len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}"); continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            failures.append((name, f"VALUES: first diffs {diff}"))
            print(f"FAIL {name}: values"); continue
        print(f"OK {name}: {len(srows)} rows match")

    print(f"\n{len(failures)} failures")
    for name, why in failures:
        print(f"--- {name}: {why[:600]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
