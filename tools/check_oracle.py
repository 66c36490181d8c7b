#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every catalog
query at a given sf_dir and diff against its SQL oracle via DuckDB
(row count + sorted-column schema + order-insensitive value hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd
import ray
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df) -> pd.DataFrame:
    if isinstance(df, ray.data.Dataset):
        df = df.to_pandas()
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    parts = []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        parts.append(col.astype(str).str.cat(sep="\x1f"))
    return hashlib.md5("\x1e".join(parts).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from ocr_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or list(QUERIES)
    results, n_fail = {}, 0
    for name in names:
        t0 = time.time()
        try:
            mine = norm(QUERIES[name](sf_dir))
            if name not in ORACLE_SQL:
                results[name] = {"err": "no_oracle", "rows": len(mine),
                                 "sec": round(time.time() - t0, 2)}
                continue
            orc = norm(con.execute(ORACLE_SQL[name]).df())
            rec = {
                "rows_match": len(mine) == len(orc),
                "schema_match": list(mine.columns) == list(orc.columns),
                "hash_match": value_hash(mine) == value_hash(orc),
                "rows": len(mine), "oracle_rows": len(orc),
                "sec": round(time.time() - t0, 2),
            }
            if not all([rec["rows_match"], rec["schema_match"], rec["hash_match"]]):
                n_fail += 1
                rec["FAIL"] = True
            results[name] = rec
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            results[name] = {"err": f"{type(ex).__name__}: {ex}"[:300],
                             "sec": round(time.time() - t0, 2)}
    print(json.dumps(results, indent=1))
    print(f"\n{len(names) - n_fail}/{len(names)} ok, {n_fail} FAIL", file=sys.stderr)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
