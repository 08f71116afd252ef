#!/usr/bin/env python3
"""Incremental companion to check_scale.py (builder tooling): polls a
graft.Verify output directory WHILE the engine pass is still running and
oracles each query as soon as its parquet dir is complete (_SUCCESS
marker), so a multi-hour large-SF audit overlaps engine and oracle work
instead of serializing them. Requires oracle_sql.json to be present in
the out dir up front (copy one from a small-SF Verify run — the SQL text
is SF-independent).

Usage: tools/check_incremental.py <sfDir> <outDir> [timeoutSec] [workers]
                                  [enginePid]
Stops when <outDir>/VERIFY_DONE exists (or, when enginePid is given,
that process is dead — a mid-loop driver OOM must fail the lane, not
hang it) and every completed query dir has been checked. Results
append to <outDir>/incremental_results.txt.
"""
import json, os, subprocess, sys, time
import concurrent.futures as cf

def main(sf_dir, out_dir, timeout=900, workers=2, engine_pid=None):
    res_path = os.path.join(out_dir, "incremental_results.txt")
    done = set()
    if os.path.exists(res_path):
        for l in open(res_path):
            if l.strip():
                done.add(l.split()[1].rstrip(":"))
    lock_print = __import__("threading").Lock()

    def one(name):
        # worker budgets are HARD-scoped here (a caller's serial-phase
        # DUCKDB_TEMP_LIMIT must not leak in: two workers inheriting a
        # 60 GB spill cap raced the disk in the r10 regeneration)
        env = dict(os.environ, DUCKDB_MEMORY_LIMIT="12GB",
                   DUCKDB_TEMP_LIMIT="40GB")
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout, env=env)
            out = p.stdout.strip()
            line = next((l for l in out.splitlines()
                         if l.startswith(("PASS", "FAIL"))), out[:300])
            detail = out if line.startswith("FAIL") else ""
        except subprocess.TimeoutExpired:
            line, detail = f"ORACLE_TIMEOUT {name} (> {timeout}s)", ""
        with lock_print:
            with open(res_path, "a") as f:
                f.write(line + "\n")
                if detail:
                    f.write("  | " + detail.replace("\n", "\n  | ") + "\n")
            print(line, flush=True)

    def engine_alive():
        if engine_pid is None:
            return True
        try:
            os.kill(engine_pid, 0)
            return True
        except OSError:
            return False

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        pending = {}
        while True:
            finished = (os.path.exists(os.path.join(out_dir, "VERIFY_DONE"))
                        or not engine_alive())
            for name in sorted(os.listdir(out_dir)):
                d = os.path.join(out_dir, name)
                if (name not in done and name not in pending
                        and os.path.isdir(d)
                        and os.path.exists(os.path.join(d, "_SUCCESS"))):
                    pending[name] = ex.submit(one, name)
            for name, fut in list(pending.items()):
                if fut.done():
                    done.add(name); del pending[name]
            if finished and not pending:
                if not os.path.exists(os.path.join(out_dir, "VERIFY_DONE")):
                    print("WARN: engine process died without VERIFY_DONE -- "
                          "unchecked queries will ledger as engine-side "
                          "no-result", flush=True)
                break
            time.sleep(20)
    n = {"PASS": 0, "FAIL": 0, "ORACLE_TIMEOUT": 0}
    for l in open(res_path):
        for k in n:
            if l.startswith(k):
                n[k] += 1
    print(f"== {n['PASS']} pass / {n['FAIL']} fail / "
          f"{n['ORACLE_TIMEOUT']} oracle-timeout ==")

if __name__ == "__main__":
    a = sys.argv
    main(a[1], a[2], int(a[3]) if len(a) > 3 else 900,
         int(a[4]) if len(a) > 4 else 2,
         int(a[5]) if len(a) > 5 else None)
