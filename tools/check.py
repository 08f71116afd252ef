#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (builder tooling only;
the shipped library is pure Scala). Reads graft.Verify output (parquet per
query + oracle_sql.json), runs each oracle SQL in DuckDB against the same
testdata parquet, and hash-compares values with columns sorted by name.

Usage: tools/check.py <sfDir> <verifyOutDir> [onlyQuery[,onlyQuery...]]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # sort rows by all columns for order-insensitive compare
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    # opt-in resource caps for the large-SF audit (check_scale.py): keep
    # N worker processes from oversubscribing the box or spilling
    # unboundedly into cwd
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
        con.execute("SET threads=4")
        tmp = f".tmp/duck_{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
        con.execute(f"SET max_temp_directory_size="
                    f"'{os.environ.get('DUCKDB_TEMP_LIMIT', '40GB')}'")
        # a SIGKILL'd (timed-out) run can't clean its own spill, and a
        # 37 GB orphan per killed attempt silently eats the box — the
        # sf10 audit's cascading no-space failures were this. Reap any
        # duck_* dir whose owning pid is gone before adding our own.
        import atexit, shutil, signal
        for d in glob.glob(".tmp/duck_*"):
            pid = d.rsplit("_", 1)[-1]
            if pid != str(os.getpid()) and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(d, ignore_errors=True)
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    # byte-identical oracle SQL (physical-twin gates like
    # q_cf_sims/q_cf_sims_salted) runs ONCE per process — the sf10
    # audit's "green by identity" argument made mechanical
    want_cache = {}
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            if sql in want_cache:
                want = want_cache[sql]
            else:
                want = want_cache[sql] = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = ok_schema and ok_rows and got.astype(str).equals(want.astype(str))
        if ok_vals:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: schema_match={ok_schema} rows {len(got)}/{len(want)}")
            if ok_schema:
                merged = got.astype(str).compare(want.astype(str)) if ok_rows else None
                if merged is not None and len(merged):
                    print(merged.head(10))
                else:
                    print("spark:\n", got.head(5), "\noracle:\n", want.head(5))
            else:
                print("spark cols:", list(got.columns), "oracle cols:", list(want.columns))
    # queries without an oracle: rows-only check
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if only and name not in only:
            continue
        if os.path.isdir(d) and name not in oracle:
            files = glob.glob(os.path.join(d, "*.parquet"))
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "PASS" if rows > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {rows})")
            if rows > 0: n_pass += 1
            else: n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
