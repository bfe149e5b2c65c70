#!/usr/bin/env python3
"""Emit the CORRECTNESS_r{n}.json artifact (the schema CORRECTNESS_r01-r11
use: per-query rows/schema/hash match + row counts) from a graft.Verify
output directory — the same computation as check.py, structured instead of
line-printed. Usage: correctness_artifact.py <sf_dir> <verify_out_dir> <artifact.json>
Queries registered without an oracle (q_approx_distinct) are recorded as
rows-only: rows_match from spark_rows > 0, hash/schema null."""
import sys, json, glob, os, hashlib, duckdb, pandas as pd, numpy as np

sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
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

def hash_vals(df):
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            vals = ["%.9g" % v if pd.notna(v) else "NULL" for v in col]
        else:
            # Series-level astype(str), NOT per-value str(): the check.py
            # element compare uses the Series cast, which normalizes
            # datetime64 vs boxed-date reprs identically across engines
            # (str(Timestamp) carries a midnight time; the Series cast of
            # both frames does not) — the hash must hash what the compare
            # compared or engine dtype quirks fail the hash alone.
            ss = col.astype(str)
            vals = [ss.iloc[i] if pd.notna(col.iloc[i]) else "NULL"
                    for i in range(len(col))]
        h.update(("\x1f".join(vals) + "\x1e").encode())
    return h.hexdigest()

result = {}
spark_dirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
for name in spark_dirs:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    entry = {"rows_match": False, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        entry["spark_rows"] = int(len(spark_df))
        if name not in oracle:
            entry["rows_match"] = len(spark_df) > 0
            entry["err"] = "rows-only: no oracle registered"
            result[name] = entry
            continue
        duck_df = con.execute(oracle[name]).df()
        entry["oracle_rows"] = int(len(duck_df))
        s, d = canon(spark_df), canon(duck_df)
        entry["rows_match"] = len(s) == len(d)
        entry["schema_match"] = list(s.columns) == list(d.columns)
        if entry["rows_match"] and entry["schema_match"]:
            # float columns: exact check like check.py (atol=0), hash on repr
            eq_all = True
            for c in s.columns:
                sv, dv = s[c], d[c]
                both = ~sv.isna() & ~dv.isna()
                if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
                    eq = (both & np.isclose(sv.where(both), dv.where(both), rtol=0, atol=0)) \
                        | (sv.isna() & dv.isna())
                else:
                    eq = (both & (sv.astype(str) == dv.astype(str))) | (sv.isna() & dv.isna())
                if not eq.all():
                    eq_all = False
                    break
            entry["hash_match"] = bool(eq_all and hash_vals(s) == hash_vals(d))
        else:
            entry["hash_match"] = False
    except Exception as e:
        entry["err"] = str(e)[:300]
    result[name] = entry

json.dump(result, open(artifact, "w"), indent=1)
ok = sum(1 for v in result.values() if v["hash_match"])
print(f"wrote {artifact}: {len(result)} queries, {ok} hash-green")
