"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and compare to
its oracle_sql() DuckDB result — row count, column names, and full
sorted-value equality (stricter than the driver's hash).

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from nolock_social_ocr_services_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, float):
        return (2, str(round(v, 9)))
    if hasattr(v, "as_tuple"):  # Decimal
        return (2, str(v))
    if isinstance(v, int):
        return (2, str(v))
    return (3, str(v))


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check_oracle", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(norm(v) for v in (row[c] for c in spark_cols))
            for row in sdf.collect()
        )
        if name not in oracles:
            print(f"{name:24s} rows={len(spark_rows):7d}  (no oracle: rows-only)")
            if not spark_rows:
                failures.append((name, "0 rows, no oracle"))
            continue
        rel = con.sql(oracles[name])
        duck_cols_raw = rel.columns
        order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
        duck_cols = sorted(duck_cols_raw)
        duck_rows = sorted(
            tuple(norm(r[i]) for i in order) for r in rel.fetchall()
        )
        status = "OK"
        if spark_cols != duck_cols:
            status = f"COLUMN MISMATCH spark={spark_cols} duck={duck_cols}"
        elif len(spark_rows) != len(duck_rows):
            status = f"ROWCOUNT spark={len(spark_rows)} duck={len(duck_rows)}"
        elif spark_rows != duck_rows:
            n_bad = sum(1 for a, b in zip(spark_rows, duck_rows) if a != b)
            first = next((a, b) for a, b in zip(spark_rows, duck_rows) if a != b)
            status = f"VALUES {n_bad} differ; first: spark={first[0]} duck={first[1]}"
        print(f"{name:24s} rows={len(spark_rows):7d}  {status}")
        if status != "OK":
            failures.append((name, status))
    print()
    if failures:
        print(f"FAILED: {len(failures)} -> {[f[0] for f in failures]}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
