"""Driver-contract self-check: runs entry(spark) + every queries() entry at a
given sf and compares against oracle_sql() via DuckDB, mimicking the
per-round CORRECTNESS harness (row count + schema + order-insensitive
value hash). Usage: python tools/selfcheck.py [sf_dir] [query ...]
(naming queries after sf_dir restricts the run to those lanes and skips the
entry smoke — a builder-iteration convenience; the round gate is the full
run ending ALL OK)"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        df.astype(str).itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from rensa_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=16)

    if not only:
        print("== entry(spark) smoke ==")
        res = entrymod.entry(spark)
        out = res.limit(5).toPandas()
        n = res.count()
        print(f"entry rows={n} schema={[f.name for f in res.schema.fields]}")
        assert n >= 0
        print(out.to_string())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(sdf)} cols={sorted(sdf.columns)}")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        hs, ho = value_hash(sdf), value_hash(odf)
        status = "OK" if (ok_rows and ok_cols and hs == ho) else "MISMATCH"
        print(
            f"[{status}] {name}: spark_rows={len(sdf)} oracle_rows={len(odf)} "
            f"cols_match={ok_cols} hash {hs} vs {ho}"
        )
        if status != "OK":
            failures.append(name)
            merged = sdf.merge(
                odf, on=list(odf.columns[:1]), suffixes=("_spark", "_oracle")
            ).head(5)
            print(merged.to_string())
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
