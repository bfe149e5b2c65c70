#!/usr/bin/env python3
"""The sf>=1 correctness gate (VERDICT r14 #3): the full driver-mirror
compare (same canon/hash logic as correctness_artifact.py) over a
10x-replicated sf0.1 dataset (~sf1), with a PER-QUERY ORACLE TIME BUDGET.

At this scale a handful of DuckDB oracle twins become interpreted-lambda
bound (the 64-hash minhash signature, winnow comprehensions, Levenshtein
pair verifies) - the exact cost the Spark side avoids with compiled
kernels. Those queries record err="oracle_timeout>Ns" instead of
silently stalling the gate; the Spark side's execution of every query at
this scale is evidenced separately by the Verify dump row counts and
BENCH_SF1. Everything else gets the full rows/schema/hash verdict.

Usage: sf1_gate.py <sf_dir> <verify_out_dir> <artifact.json> [budget_s] [workers]
"""
import sys, json, glob, os, hashlib, multiprocessing as mp

sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
budget = int(sys.argv[4]) if len(sys.argv) > 4 else 180
workers = int(sys.argv[5]) if len(sys.argv) > 5 else 6

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def canon(df):
    import pandas as pd, numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def hash_vals(df):
    import pandas as pd
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            vals = ["%.9g" % v if pd.notna(v) else "NULL" for v in col]
        else:
            ss = col.astype(str)
            vals = [ss.iloc[i] if pd.notna(col.iloc[i]) else "NULL"
                    for i in range(len(col))]
        h.update(("\x1f".join(vals) + "\x1e").encode())
    return h.hexdigest()


# Row-order-insensitive multiset hash for LARGE frames: canon()'s
# sort_values over multi-million-row object columns is the real cost of
# the compare phase at 10x (ns_snapshot_diff_chain hit compare_timeout,
# not oracle_timeout). Normalizing each column to strings (same NULL and
# %.9g float conventions as hash_vals) and SUMMING the vectorized
# per-row hashes makes the compare O(n) with no sort; uint64 wraparound
# is part of the hash. Both frames go through the same path, so the
# equality verdict is unchanged in meaning.
BIG_ROWS = 200_000


def hash_multiset(df):
    import pandas as pd, numpy as np
    if len(df) == 0:
        return "empty"
    norm = {}
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            # list-valued cells: tuple-normalize like canon() — str() of a
            # large ndarray elides elements ("...") and engines disagree.
            col = col.apply(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if pd.api.types.is_float_dtype(col):
            s = col.map(lambda v: "%.9g" % v if pd.notna(v) else "NULL")
        else:
            s = col.astype(str).where(col.notna(), "NULL")
        norm[c] = s
    # ADVICE r16 #3: a single commutative uint64 sum is a weaker collision
    # bound than the SHA-256 canon path this replaces past 200k rows.
    # Combine two INDEPENDENT sort-free reductions — sum and XOR of
    # per-row hashes under two different hash_key seeds — so an accidental
    # large-frame collision must defeat ~128 bits, not 64.
    frame = pd.DataFrame(norm, columns=list(df.columns))
    hv1 = pd.util.hash_pandas_object(frame, index=False).values
    hv2 = pd.util.hash_pandas_object(
        frame, index=False, hash_key="1b873593cc9e2d51").values
    xor2 = np.bitwise_xor.reduce(hv2.astype(np.uint64))
    return (f"msum:{np.uint64(hv1.sum()):d}:"
            f"x{np.uint64(xor2):016x}:{len(df)}")


def mark(tmpdir, name, phase):
    """Phase marker (ADVICE r15 #2): the parent restarts the kill clock on
    every phase transition, so only the con.execute(oracle) phase is held
    to the oracle budget — a slow Spark-dump read or a stall in pandas
    canon/hash is reported as that phase's overrun, not blamed on DuckDB.
    """
    if tmpdir:
        with open(f"{tmpdir}/{name}.phase", "w") as f:
            f.write(phase)


def one(name, tmpdir=None):
    """Worker: full compare for one query; runs under a kill budget."""
    import duckdb, pandas as pd
    entry = {"rows_match": False, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        mark(tmpdir, name, "read_dump")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) \
            if files else pd.DataFrame()
        entry["spark_rows"] = int(len(spark_df))
        if name not in oracle:
            entry["rows_match"] = len(spark_df) > 0
            entry["err"] = "rows-only: no oracle registered"
            return name, entry
        mark(tmpdir, name, "view_setup")
        con = duckdb.connect()
        con.execute(f"SET threads TO 4")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        mark(tmpdir, name, "oracle")
        duck_df = con.execute(oracle[name]).df()
        mark(tmpdir, name, "compare")
        entry["oracle_rows"] = int(len(duck_df))
        if max(len(spark_df), len(duck_df)) > BIG_ROWS:
            s = spark_df.reindex(sorted(spark_df.columns), axis=1)
            d = duck_df.reindex(sorted(duck_df.columns), axis=1)
            entry["rows_match"] = len(s) == len(d)
            entry["schema_match"] = list(s.columns) == list(d.columns)
            eq_all = entry["rows_match"] and entry["schema_match"]
            entry["hash_match"] = bool(
                eq_all and hash_multiset(s) == hash_multiset(d))
        else:
            s, d = canon(spark_df), canon(duck_df)
            entry["rows_match"] = len(s) == len(d)
            entry["schema_match"] = list(s.columns) == list(d.columns)
            eq_all = entry["rows_match"] and entry["schema_match"]
            entry["hash_match"] = bool(
                eq_all and hash_vals(s) == hash_vals(d))
    except Exception as e:
        entry["err"] = f"{type(e).__name__}: {str(e)[:200]}"
    return name, entry


def one_to_file(name, tmpdir):
    _, entry = one(name, tmpdir)
    with open(f"{tmpdir}/{name}.json", "w") as f:
        json.dump(entry, f)


if __name__ == "__main__":
    import tempfile, time
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    tmpdir = tempfile.mkdtemp(prefix="sf1gate_")
    result = {}
    pending = list(names)
    running = {}  # name -> (Process, start_time)

    def phase_of(name):
        try:
            return open(f"{tmpdir}/{name}.phase").read().strip()
        except OSError:
            return "spawn"

    def harvest(name, proc, timed_out):
        path = f"{tmpdir}/{name}.json"
        if os.path.exists(path):
            entry = json.load(open(path))
        elif timed_out:
            # Label the overrun by the phase the worker was actually in:
            # only an 'oracle' kill is a DuckDB-engine-bound claim.
            ph = phase_of(name)
            kind = ("oracle_timeout" if ph == "oracle"
                    else f"{ph}_timeout")
            entry = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": f"{kind}>{budget}s"}
        else:
            entry = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None,
                     "err": f"worker died (exitcode {proc.exitcode})"}
        result[name] = entry
        tag = ("TIMEOUT" if "_timeout>" in (entry["err"] or "")
               else "ok" if entry.get("hash_match") or
               ((entry["err"] or "").startswith("rows-only") and
                entry["rows_match"])
               else "FAIL")
        print(f"[sf1-gate] {name}: {tag} ({entry['err'] or 'hash'})",
              flush=True)

    # running: name -> [Process, phase, phase_start] — the kill clock
    # restarts on every phase transition (ADVICE r15 #2), so each phase
    # gets the full budget and the timeout label names the guilty phase.
    while pending or running:
        while pending and len(running) < workers:
            n = pending.pop(0)
            p = mp.Process(target=one_to_file, args=(n, tmpdir))
            p.start()
            running[n] = [p, "spawn", time.time()]
        time.sleep(0.5)
        for n in list(running):
            p, ph, t0 = running[n]
            now_ph = phase_of(n)
            if now_ph != ph:
                running[n] = [p, now_ph, time.time()]
                continue
            if not p.is_alive():
                p.join()
                harvest(n, p, timed_out=False)
                del running[n]
            elif time.time() - t0 > budget:
                p.terminate()
                p.join()
                harvest(n, p, timed_out=True)
                del running[n]
    ok = sum(1 for e in result.values() if e.get("hash_match"))
    ro = sum(1 for e in result.values()
             if (e.get("err") or "").startswith("rows-only") and e["rows_match"])
    to = sum(1 for e in result.values()
             if "_timeout>" in (e.get("err") or ""))
    fail = len(result) - ok - ro - to
    meta = {"sf_dir": sf_dir, "n_queries": len(result), "hash_ok": ok,
            "rows_only_ok": ro, "oracle_timeout": to, "fail": fail,
            "oracle_budget_s": budget}
    if to:
        meta["note"] = ("*_timeout rows name the phase the worker was in "
                        "when killed (only 'oracle_timeout' is a "
                        "DuckDB-engine-bound claim); the Spark side executed "
                        "them - see the Verify dump and BENCH_SF1")
    json.dump({"meta": meta, "queries": result},
              open(artifact, "w"), indent=1, sort_keys=True)
    print(f"[sf1-gate] DONE ok={ok} rows_only={ro} timeout={to} fail={fail} "
          f"-> {artifact}")
    sys.exit(1 if fail else 0)
