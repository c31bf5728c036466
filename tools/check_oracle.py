"""Local stand-in for the driver's correctness gate: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB at a given sf,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return repr(f)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    return str(v)


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(norm_cell(r[c]) for c in cols)
        for _, r in pdf.iterrows()
    ]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    args = sys.argv[1:]
    ledger_path = None
    if "--ledger" in args:
        i = args.index("--ledger")
        ledger_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from xutil_spark.entry_queries import ORACLES, QUERIES
    from xutil_spark.session import get_session

    names = args[1:] or [n for n in QUERIES if n in ORACLES]

    spark = get_session(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    ledger: dict = {}
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[ERROR] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            ledger[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        h1 = value_hash(sdf) if ok_cols else "-"
        h2 = value_hash(odf) if ok_cols else "-"
        ok = ok_rows and ok_cols and h1 == h2
        ledger[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                        "hash_match": h1 == h2, "spark_rows": len(sdf),
                        "oracle_rows": len(odf), "err": None}
        print(f"[{'OK' if ok else 'FAIL'}] {name}: rows {len(sdf)}/{len(odf)}"
              f" cols={'ok' if ok_cols else (list(sdf.columns), list(odf.columns))}"
              f" hash={'match' if h1 == h2 else 'MISMATCH'}")
        if not ok:
            failures.append(name)
            if ok_cols and len(sdf) and len(odf):
                key = sorted(sdf.columns)[0]
                m = sdf.sort_values(list(sorted(sdf.columns))).head(3)
                o = odf.sort_values(list(sorted(odf.columns))).head(3)
                print("  spark:", m.to_dict("records"))
                print("  duck :", o.to_dict("records"))
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    if ledger_path:
        import json
        merged: dict = {}
        if os.path.exists(ledger_path):
            with open(ledger_path) as fh:
                merged = json.load(fh)
        merged.update(ledger)
        with open(ledger_path, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        print(f"ledger: {len(merged)} entries -> {ledger_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
