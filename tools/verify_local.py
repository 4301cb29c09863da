#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir> [query ...]

Reads each Spark result parquet under <outDir>/<name>/ and compares it to
the DuckDB result of oracle_sql.json[<name>] run over the same parquet
tables (views named after the files in <sfDir>). Sorts columns by name and
rows by all columns before comparing, like the driver's hash compare.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize date/timestamp-ish columns to ISO strings for comparison
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[c] = s.map(lambda v: v.isoformat() if hasattr(v, "isoformat")
                           else v)
        else:
            out[c] = s
    df = pd.DataFrame(out)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # DuckDB's peak memory on the heavy retrained-codebook oracles scales
    # with thread count (per-thread pipeline buffers); at 32 threads the
    # 10x fixtures exceed even a 100 GiB budget while 8 threads fit in
    # <48 GiB. Tunable for big-fixture runs; default leaves DuckDB as-is.
    threads = os.environ.get("GRAFT_ORACLE_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    memlim = os.environ.get("GRAFT_ORACLE_MEM")
    if memlim:
        con.execute(f"SET memory_limit='{memlim}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: schema spark={list(g.columns)} "
                  f"duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            if np.issubdtype(a.dtype, np.floating) or \
               np.issubdtype(b.dtype, np.floating):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                neq = ~((af == bf) | (np.isnan(af) & np.isnan(bf)))
                if neq.any():
                    i = int(np.argmax(neq))
                    bad.append((c, af[i], bf[i],
                                float(np.nanmax(np.abs(af - bf)))))
            else:
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    bad.append((c, a.iloc[i], b.iloc[i], None))
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched col(s):")
            for c, x, y, mx in bad[:5]:
                print(f"   {c}: spark={x!r} duck={y!r}"
                      + (f" maxabs={mx}" if mx is not None else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
