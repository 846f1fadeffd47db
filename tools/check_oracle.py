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

def render(v):
    """Canonical rendering of a cell, approximating the driver's hash input.
    Integral floats render without the trailing .0 so an int64 column on one
    side and a float64 on the other (pandas nullable-int promotion) agree."""
    import decimal, math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # isfinite guard: int(inf) raises OverflowError and would crash the
        # whole checker run instead of reporting a mismatch for that query
        if math.isfinite(v) and v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return str(v)
    s = str(v)
    # DATE columns come back as datetime.date from Spark parquet but as
    # midnight datetime64 from DuckDB's .df(); the driver treats them as equal
    # (a04/a11 passed round 1), so strip the midnight time part on both sides.
    if s.endswith(" 00:00:00"):
        s = s[: -len(" 00:00:00")]
    return s

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
            continue
        # strict render check mimicking the driver's hash compare: the driver
        # hashes rendered values, so a Decimal('1.500000') vs float 1.5 that
        # is numerically equal still hash-mismatches (this is exactly what the
        # tolerant check above missed in round 1 — 8 DECIMAL(38,6) queries).
        hash_risk = None
        for c in got.columns:
            gr = got[c].map(render)
            wr = want[c].map(render)
            if not (gr == wr).all():
                bad = gr != wr
                hash_risk = (c, gr[bad].head(3).tolist(), wr[bad].head(3).tolist())
                break
        if hash_risk:
            c, gv, wv = hash_risk
            print(f"HASH RISK       {name}.{c}: got {gv} want {wv}")
            n_fail += 1
        else:
            print(f"OK              {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
