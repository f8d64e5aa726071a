"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at a given sf dir, run its DuckDB oracle on the
same parquet tables, compare row count + column names + order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main(sf_dir: str) -> int:
    import __spark_entry__ as e
    from aida_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = e.oracle_sql()
    failures = 0
    for name, fn in e.queries().items():
        sdf = fn(spark, sf_dir)
        spark_rows = [r.asDict() for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_rows)} rows")
            continue
        ddf = con.execute(oracles[name]).fetch_df()
        duck_rows = ddf.to_dict("records")
        scols = set(sdf.columns)
        dcols = set(ddf.columns)
        status = []
        if scols != dcols:
            status.append(f"SCHEMA {scols} vs {dcols}")
        if len(spark_rows) != len(duck_rows):
            status.append(f"COUNT {len(spark_rows)} vs {len(duck_rows)}")
        if not status:
            a = normalize(spark_rows, scols)
            b = normalize(duck_rows, scols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES mismatch, first diffs: {diffs}")
        if status:
            failures += 1
            print(f"{name:28s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:28s} OK ({len(spark_rows)} rows)")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf) else 0)
