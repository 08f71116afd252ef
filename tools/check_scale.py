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
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # rows-only queries (no oracle) are cheap — let check.py handle them
    # in the first worker batch by passing them through as names too
    dirs = sorted(n for n in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, n)))
    names = sorted(set(oracle) | set(dirs))
    # byte-identical oracle SQL (physical twins, e.g. q_cf_sims /
    # q_cf_sims_salted) goes to ONE check.py subprocess so the in-
    # process want-cache covers all twins with a single DuckDB run
    by_sql, groups = {}, []
    for n in names:
        sql = oracle.get(n)
        if sql is not None and sql in by_sql:
            by_sql[sql].append(n)
        else:
            g = [n]
            if sql is not None:
                by_sql[sql] = g
            groups.append(g)
    results = {}

    def one(group):
        env = dict(os.environ, DUCKDB_MEMORY_LIMIT="12GB")
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                 sf_dir, out_dir, ",".join(group)],
                capture_output=True, text=True, timeout=timeout, env=env)
            out = p.stdout.strip()
            lines = {}
            for name in group:
                # trailing space/colon: names can be prefixes of one
                # another (q_cf_sims vs q_cf_sims_salted)
                lines[name] = next(
                    (l for l in out.splitlines()
                     if l.startswith((f"PASS {name} ", f"FAIL {name} ",
                                      f"FAIL {name}:"))),
                    out[:200])
            return lines
        except subprocess.TimeoutExpired:
            return {name: f"ORACLE_TIMEOUT {name} (> {timeout}s)"
                    for name in group}

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for lines in ex.map(one, groups):
            for name, line in sorted(lines.items()):
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
