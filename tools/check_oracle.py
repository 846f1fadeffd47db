#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs oracleSql, mimicking the driver's
DuckDB compare (sort columns by name, sort rows, compare values).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
where <verify_out_dir> is the output of `sbt "runMain graft.Verify <sf_dir> <out>"`.

Dev tool only — not part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: decimals -> float strings with fixed scale, ts -> iso
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"MISSING OUTPUT  {name}")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR           {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA MISMATCH {name}: got {list(got.columns)} want {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"ROWS MISMATCH   {name}: got {len(got)} want {len(want)}")
            n_fail += 1
            continue
        # value compare with float tolerance-free equality after string canon
        mismatch = None
        for c in got.columns:
            g, w = got[c], want[c]
            try:
                gf = pd.to_numeric(g, errors="raise")
                wf = pd.to_numeric(w, errors="raise")
                eq = ((gf.isna() & wf.isna()) | (gf == wf)).all()
            except Exception:
                eq = ((g.isna() & w.isna()) | (g.astype(str) == w.astype(str))).all()
            if not eq:
                mismatch = c
                break
        if mismatch:
            bad = got[mismatch] != want[mismatch]
            print(f"VALUE MISMATCH  {name}.{mismatch}: "
                  f"got {got[mismatch][bad].head(3).tolist()} want {want[mismatch][bad].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"OK              {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
