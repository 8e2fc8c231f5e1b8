#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata parquet, compares after sorting columns by
name and rows by all columns. Usage:

    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    from decimal import Decimal
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
        elif df[c].dtype == object and len(df):
            first = df[c].dropna().head(1)
            if len(first):
                v = first.iloc[0]
                if isinstance(v, (datetime.date, datetime.datetime)):
                    df[c] = pd.to_datetime(df[c])
                elif isinstance(v, Decimal):
                    df[c] = df[c].astype("float64")
        # unify datetime resolution (ns vs us is a pandas/pyarrow artifact
        # the driver's hash does not distinguish — r06 proves those pass)
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            failures += 1
            continue
        # dtype-strict pass: the driver hashes materialized column bytes,
        # so an int64-vs-float64 divergence (e.g. DuckDB HUGEINT from an
        # un-CAST sum(BIGINT)) fails the driver even when values match.
        # Compare dtypes on the normalized frames (dates/decimals unified
        # the same way on both sides, matching the driver's tolerance).
        bad = [(c, str(g[c].dtype), str(w[c].dtype))
               for c in g.columns if g[c].dtype != w[c].dtype]
        if bad:
            hints = []
            for c, gd, wd in bad:
                hint = ""
                if gd.startswith("int") and wd in ("float64", "object"):
                    hint = " (oracle likely needs CAST — DuckDB HUGEINT/int128?)"
                hints.append(f"  {c}: spark={gd} oracle={wd}{hint}")
            print(f"FAIL {name}: dtype mismatch (values equal; driver hash "
                  f"would differ)\n" + "\n".join(hints))
            failures += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
    # queries without oracle: rows-only check
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracles:
            n = len(pd.read_parquet(p))
            status = "PASS" if n > 0 else "FAIL"
            if n == 0:
                failures += 1
            print(f"{status} {name} (rows-only: {n} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
