#!/usr/bin/env python3
"""Dev-only oracle checker (mirrors the driver's correctness gate).

NOT part of the shipped Scala library — this is the local feedback loop:
  1. sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  2. python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, and compares: column sets, schema-ish dtypes, and exact values
after sorting columns by name and rows by all columns.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values to strings for hashing-ish exact compare
    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)  # full precision
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda col: col.map(canon))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # thrown queries have no output dir; without this check a broken
    # entry reads as a shorter-but-green run (the round-9 lesson)
    failed_marker = Path(out_dir) / "_failed.json"
    if failed_marker.exists():
        failed = json.loads(failed_marker.read_text())
        for name, err in failed.items():
            print(f"FAIL {name}: query THREW in Verify: {err}")
        if failed:
            print(f"\n{len(failed)} queries threw — gate FAILED")
            return 1
    n_ok = n_bad = 0
    only_rows = []
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = pd.read_parquet(d)
        if name not in oracle:
            only_rows.append((name, len(got)))
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} "
                  f"duckdb={sorted(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}")
            n_bad += 1
            continue
        g, w = normalize(got), normalize(want)
        if g.equals(w):
            print(f"OK   {name}: {len(got)} rows")
            n_ok += 1
        else:
            diff = (g != w)
            bad_cols = [c for c in g.columns if diff[c].any()]
            idx = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            print("  spark :", g[idx].head(3).to_dict("records"))
            print("  duckdb:", w[idx].head(3).to_dict("records"))
            n_bad += 1
    for name, n in only_rows:
        print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} fail, {len(only_rows)} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
