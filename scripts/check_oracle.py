"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() twin on DuckDB, compare row count, sorted
column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(df) -> tuple[int, str, str]:
    """(row_count, sorted-col-names, order-insensitive value hash) for a
    pandas DataFrame."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(
            "\x1f".join("" if v is None or v != v else _norm(v) for v in tup)
        )
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), ",".join(cols), h


def _norm(v) -> str:
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from wcdimportbot_spark import get_spark
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"  {name:35s} rows={len(sdf):7d}  (rows-only) {t_spark:5.1f}s")
            continue
        t0 = time.time()
        ddf = con.execute(spec.oracle).df()
        t_duck = time.time() - t0
        s_n, s_cols, s_hash = value_hash(sdf)
        d_n, d_cols, d_hash = value_hash(ddf)
        ok = (s_n, s_cols, s_hash) == (d_n, d_cols, d_hash)
        status = "OK " if ok else "FAIL"
        print(
            f"  {name:35s} {status} rows={s_n}/{d_n} spark={t_spark:5.1f}s duck={t_duck:4.1f}s"
        )
        if not ok:
            failures.append(name)
            if s_cols != d_cols:
                print(f"    cols spark={s_cols}")
                print(f"    cols duck ={d_cols}")
            elif s_n == d_n:
                print(f"    value hash mismatch: {s_hash} vs {d_hash}")

    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
