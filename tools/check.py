#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
query in DuckDB over the sf tables, compare to Spark's parquet dump
(columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os, duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # Driver tables are single files; Spark-written replicas (the 10x
    # scale probe) are directories of part files - glob those.
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v,(list,np.ndarray)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

ok = fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}"); fail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE ERR {name}: {str(e)[:200]}"); fail += 1; continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"SCHEMA MISMATCH {name}: spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(s)} duck={len(d)}"); fail += 1; continue
    mismatch = False
    for c in s.columns:
        sv, dv = s[c], d[c]
        both = ~sv.isna() & ~dv.isna()
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            # NULL must only equal NULL - no fillna masking (a null aggregate
            # and a genuine 0.0 are different answers).
            eq = (both & np.isclose(sv.where(both), dv.where(both), rtol=0, atol=0)) \
                | (sv.isna() & dv.isna())
        else:
            eq = (both & (sv.astype(str) == dv.astype(str))) | (sv.isna() & dv.isna())
        if not eq.all():
            i = int(np.argmin(eq.values))
            print(f"VALUE MISMATCH {name}.{c} row{i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
            mismatch = True; break
    if mismatch: fail += 1
    else: ok += 1; print(f"OK {name} ({len(s)} rows)")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
