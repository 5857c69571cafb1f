"""Driver-style parity check: run queries() vs oracle_sql() at a given sf
and compare rows + schema + a dtype-sensitive value hash (the driver sorts
columns by name, rows by values, then hashes values *with their dtypes* —
so an int64-vs-float64 mismatch fails even when values are equal).

Usage: python jobs/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].map(lambda v: v.isoformat() if v is not None else None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def value_hash(df: pd.DataFrame) -> str:
    # Value-repr hash (no dtype): int32 vs int64 columns with equal values
    # compare equal (as in the driver), while float64-vs-int64 (`31.0` vs
    # `31`) still mismatches — reproducing the r01 HUGEINT failures.
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from telegram2elastic_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = norm(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark err: {e}"))
            print(f"{name}: SPARK ERR {e}")
            continue
        if sql is None:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = norm(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle err: {e}"))
            print(f"{name}: ORACLE ERR {e}")
            continue
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        hmatch = rows and schema and value_hash(sdf) == value_hash(odf)
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} schema={schema} hash={hmatch}"
        )
        if status == "FAIL":
            failures.append((name, f"rows={rows} schema={schema} hash={hmatch}"))
            if rows and schema and not hmatch:
                for c in sdf.columns:
                    if str(sdf[c].dtype) != str(odf[c].dtype):
                        print(f"  dtype {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
                    elif not sdf[c].equals(odf[c]):
                        neq = sdf[c] != odf[c]
                        print(f"  values differ in {c}: {int(neq.sum())} rows")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
