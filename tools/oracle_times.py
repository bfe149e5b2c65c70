#!/usr/bin/env python3
"""Per-oracle DuckDB wall-time profile: run every oracle_sql.json query
serially against the sf tables and emit a sorted JSON timing table.
Forensics for the driver's correctness leg (VERDICT r15 #1): if the
driver's compare step runs the oracles serially under a wall budget, the
sum of these times IS the budget it must fit."""
import sys, json, time, os, duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out_json = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
t_all = time.time()
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).df()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        times[name] = -1.0
        print(f"ERR {name}: {str(e)[:120]}", file=sys.stderr)
total = round(time.time() - t_all, 1)
ranked = sorted(times.items(), key=lambda kv: -kv[1])
for n, s in ranked[:30]:
    print(f"{s:8.2f}s  {n}")
print(f"\nTOTAL {total}s over {len(times)} oracles")
if out_json:
    json.dump({"total_sec": total, "n": len(times),
               "times": dict(ranked)}, open(out_json, "w"), indent=1)
