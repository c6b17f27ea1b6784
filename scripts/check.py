#!/usr/bin/env python3
"""Dev-only correctness harness mirroring the driver's DuckDB-oracle
compare (not part of the shipped Scala library).

Usage: after `scripts/run.sh graft.Verify <sfDir> <outDir>` ran:
    python3 scripts/check.py <sfDir> <outDir> [query ...]

For each query result parquet in outDir, runs the matching oracle SQL
from outDir/oracle_sql.json in DuckDB against the same sfDir tables,
sorts columns by name + rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleGen output): a directory of parts.
            # An empty write leaves only _SUCCESS — skip it like a
            # missing single-file table instead of erroring at CREATE VIEW.
            if not glob.glob(f"{p}/*.parquet"):
                continue
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        got = canon(pd.read_parquet(qdir))
        if name not in oracle:
            print(f"  ~  {name}: no oracle (rows-only check) rows={len(got)}")
            continue
        try:
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"  X  {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        ok_shape = got.shape == exp.shape and list(got.columns) == list(exp.columns)
        if not ok_shape:
            print(f"  X  {name}: shape/cols mismatch spark={got.shape}{list(got.columns)} duck={exp.shape}{list(exp.columns)}")
            n_fail += 1
            continue
        # exact compare; also report near-miss columns
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if pd.api.types.is_datetime64_any_dtype(a) or pd.api.types.is_datetime64_any_dtype(b):
                same = (pd.to_datetime(a).astype("datetime64[ns]").astype("int64")
                        .equals(pd.to_datetime(b).astype("datetime64[ns]").astype("int64")))
            elif a.dtype.kind in "fc" or b.dtype.kind in "fc":
                same = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                same = a.astype(str).equals(b.astype(str))
            if not same:
                eq = False
                bad = (~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))).sum()
                print(f"  X  {name}: column {c} differs in {bad}/{len(a)} rows")
                merged = pd.DataFrame({"spark": a, "duck": b})
                print(merged[a.astype(str) != b.astype(str)].head(5).to_string())
        if eq:
            # 0-row == 0-row is a hash-green that proves nothing — flag
            # it so a regression that empties both sides (e.g. a sample
            # tier draining the truth set) can't hide behind a vacuous
            # pass (r17 ADVICE: q_media_recall_lowrate did exactly this)
            vac = " [VACUOUS: 0 rows on both sides]" if len(got) == 0 else ""
            print(f"  OK {name}: rows={len(got)}{vac}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
