#!/usr/bin/env python3
"""Dev-side replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares: column names (sorted), row counts, dtype kinds, and values (rows
sorted by all columns).

Strictness note (round-10 regression fix): this gate must be AT LEAST as
strict as the driver, which sorts columns by name and hashes the RENDERED
values — so an integer column on the Spark side vs a float column on the
oracle side ("20" vs "20.0") is a driver FAIL even when numerically equal.
An earlier version of norm() widened every int column to float64 before
comparing, which silently passed exactly that class of bug (an uncast DuckDB
HUGEINT sum shipped in round 9 as the ext_domain_caps hash failure). Ints
are now only unified ACROSS INT WIDTHS (→ int64), floats across float widths
(→ float64), and the two normalized frames must agree on dtype per column:
int-vs-float is a FAIL here like it is at the driver.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime
            nonnull = df[c].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == bool:
            pass
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            # unify WIDTHS only — int vs float must stay a visible mismatch
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{out_dir}/*") if not x.endswith(".json"))
    failed = []
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); failed.append(name); continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"skip  {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); failed.append(name); continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: cols {list(g.columns)} vs {list(w.columns)}"); failed.append(name); continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}"); failed.append(name); continue
        kind_bad = [c for c in g.columns if g[c].dtype.kind != w[c].dtype.kind]
        if kind_bad:
            c = kind_bad[0]
            print(f"FAIL  {name}: dtype kind mismatch col {c}: spark={g[c].dtype} oracle={w[c].dtype}"
                  f" (driver hashes rendered values — int vs float diverges)")
            failed.append(name); continue
        bad = None
        for c in g.columns:
            a, b = g[c].values, w[c].values
            if str(g[c].dtype).startswith("float"):
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            if not eq.all():
                i = int(np.argmin(eq)); bad = (c, i, a[i], b[i]); break
        if bad:
            c, i, av, bv = bad
            print(f"FAIL  {name}: col {c} row {i}: spark={av!r} oracle={bv!r}"); failed.append(name)
        else:
            print(f"ok    {name}: {len(g)} rows")
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
