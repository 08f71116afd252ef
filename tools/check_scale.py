#!/usr/bin/env python3
"""Timeout-aware wrapper around check.py for large-SF correctness audits
(builder tooling). Rationale: several completeness ORACLES are
deliberately quadratic (unblocked all-pairs edit distance, exact
all-pairs cosine) — written to prove recall at the driver's sf0.01 gate
scale — so at sf1 the ORACLE, not the engine, becomes infeasible
(observed: 48 GB DuckDB spill on one query). Each oracle runs in its
own process with a memory cap and wall-clock timeout; queries that
exceed it are reported ORACLE_TIMEOUT — a documented exclusion, not a
failure.

Usage: tools/check_scale.py <sfDir> <verifyOutDir> [timeoutSec] [workers]
"""
import json, os, subprocess, sys
import concurrent.futures as cf

def main(sf_dir, out_dir, timeout=900, workers=8):
    names = sorted(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
    # rows-only queries (no oracle) are cheap — let check.py handle them
    # in the first worker batch by passing them through as names too
    dirs = sorted(n for n in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, n)))
    names = sorted(set(names) | set(dirs))
    results = {}

    def one(name):
        env = dict(os.environ, DUCKDB_MEMORY_LIMIT="12GB")
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout, env=env)
            out = p.stdout.strip()
            line = next((l for l in out.splitlines()
                         if l.startswith(("PASS", "FAIL"))), out[:200])
            return name, line
        except subprocess.TimeoutExpired:
            return name, f"ORACLE_TIMEOUT {name} (> {timeout}s)"

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for name, line in ex.map(one, names):
            results[name] = line
            print(line, flush=True)

    n_pass = sum(1 for v in results.values() if v.startswith("PASS"))
    n_to = sum(1 for v in results.values() if v.startswith("ORACLE_TIMEOUT"))
    n_fail = len(results) - n_pass - n_to
    print(f"== {n_pass} pass / {n_fail} fail / {n_to} oracle-timeout ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    a = sys.argv
    sys.exit(main(a[1], a[2],
                  int(a[3]) if len(a) > 3 else 900,
                  int(a[4]) if len(a) > 4 else 8))
