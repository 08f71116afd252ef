#!/usr/bin/env python3
"""Classify an incremental_results.txt into the audit ledger buckets
(builder tooling): PASS, content FAIL (hash/rows/schema mismatch —
real divergence), resource FAIL (DuckDB OOM / spill / temp-dir
exhaustion — retry candidates), and ORACLE_TIMEOUT. Resource FAILs
and timeouts are the serial-retry queue (tools/retry_oracle.sh);
content FAILs are bugs.

Usage: tools/classify_results.py <outDir>/incremental_results.txt
"""
import sys, re

RESOURCE = re.compile(
    r"Out of Memory|OutOfMemory|max_temp_directory_size|could not allocate"
    r"|failed to offload|No space left|disk", re.I)

def main(path):
    buckets = {"PASS": [], "FAIL_CONTENT": [], "FAIL_RESOURCE": [],
               "ORACLE_TIMEOUT": [], "OTHER": []}
    # one logical record per PASS/FAIL/ORACLE_TIMEOUT line; continuation
    # lines (" | ...") carry the failure detail for classification
    recs, cur = [], None
    for line in open(path):
        if line.startswith(("PASS ", "FAIL ", "ORACLE_TIMEOUT ")):
            if cur:
                recs.append(cur)
            cur = line.rstrip("\n")
        elif cur is not None:
            cur += " " + line.strip()
    if cur:
        recs.append(cur)
    seen = set()
    for r in recs:
        kind, name = r.split()[0], r.split()[1].rstrip(":")
        if name in seen:
            continue  # first record wins (re-checks append)
        seen.add(name)
        if kind == "PASS":
            buckets["PASS"].append(name)
        elif kind == "ORACLE_TIMEOUT":
            buckets["ORACLE_TIMEOUT"].append(name)
        elif kind == "FAIL":
            if RESOURCE.search(r):
                buckets["FAIL_RESOURCE"].append((name, r[:160]))
            else:
                buckets["FAIL_CONTENT"].append((name, r[:300]))
        else:
            buckets["OTHER"].append(r[:160])
    for k in ("PASS", "ORACLE_TIMEOUT"):
        print(f"{k}: {len(buckets[k])}")
    print(f"FAIL_RESOURCE: {len(buckets['FAIL_RESOURCE'])}")
    for n, d in buckets["FAIL_RESOURCE"]:
        print(f"  {n}")
    print(f"FAIL_CONTENT: {len(buckets['FAIL_CONTENT'])}")
    for n, d in buckets["FAIL_CONTENT"]:
        print(f"  {n}: {d}")
    if buckets["ORACLE_TIMEOUT"]:
        print("timeouts:", " ".join(buckets["ORACLE_TIMEOUT"]))
    if buckets["OTHER"]:
        print("other:")
        for d in buckets["OTHER"]:
            print(" ", d)

if __name__ == "__main__":
    main(sys.argv[1])
