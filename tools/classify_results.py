#!/usr/bin/env python3
"""Classify an incremental_results.txt into the audit ledger buckets
(builder tooling): PASS, content FAIL (hash/rows/schema mismatch —
real divergence), resource FAIL (DuckDB OOM / spill / temp-dir
exhaustion — retry candidates), and ORACLE_TIMEOUT. Resource FAILs
and timeouts are the serial-retry queue (tools/retry_oracle.sh);
content FAILs are bugs.

Re-checks are APPENDED to the results file, so the LAST record for a
query wins; a query whose status changed across records is flagged in
a `transitions:` footer so retry outcomes are auditable.

Usage:
  tools/classify_results.py <results.txt>                 human summary
  tools/classify_results.py <results.txt> --retry-queue   names needing a
                                                          serial retry, one/line
  tools/classify_results.py <results.txt> --ledger [oracle_sql.json]
      self-contained markdown ledger; with the oracle manifest, queries
      that produced NO record (engine-side timeout/crash — no parquet
      dir ever appeared) are listed too, so the ledger's arithmetic
      closes over the full attempted set.
"""
import json, os, sys, re

# specific resource-error phrases only — a bare token like "disk" can
# appear in genuine content-divergence detail text and must not
# reclassify a real bug as retryable
RESOURCE = re.compile(
    r"Out of Memory|OutOfMemory|max_temp_directory_size|could not allocate"
    r"|failed to offload|failed to pin|No space left on device", re.I)


def classify(path):
    """Returns (buckets, transitions, other). buckets maps kind →
    [(name, detail)] with last-record-wins semantics."""
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
    latest, order, history, other = {}, [], {}, []
    for r in recs:
        parts = r.split()
        if len(parts) < 2:
            other.append(r[:160])  # truncated record (killed run)
            continue
        kind, name = parts[0], parts[1].rstrip(":")
        if name not in latest:
            order.append(name)
        latest[name] = (kind, r)  # last record wins (re-checks append)
        history.setdefault(name, []).append(kind)
    buckets = {"PASS": [], "FAIL_CONTENT": [], "FAIL_RESOURCE": [],
               "ORACLE_TIMEOUT": []}
    for name in order:
        kind, r = latest[name]
        if kind == "PASS":
            buckets["PASS"].append((name, r[:160]))
        elif kind == "ORACLE_TIMEOUT":
            buckets["ORACLE_TIMEOUT"].append((name, r[:160]))
        elif RESOURCE.search(r):
            buckets["FAIL_RESOURCE"].append((name, r[:300]))
        else:
            buckets["FAIL_CONTENT"].append((name, r[:300]))
    transitions = [(n, "->".join(ks)) for n, ks in history.items()
                   if len(set(ks)) > 1]
    return buckets, transitions, other


def main(argv):
    path, mode = argv[0], (argv[1] if len(argv) > 1 else "")
    buckets, transitions, other = classify(path)

    if mode == "--retry-queue":
        for n, _ in buckets["FAIL_RESOURCE"] + buckets["ORACLE_TIMEOUT"]:
            print(n)
        return

    if mode == "--gate":
        # exit 0 iff every query with a record is PASS and (given the
        # manifest) every manifest query produced a record
        manifest = argv[2] if len(argv) > 2 else None
        seen = {n for b in buckets.values() for n, _ in b}
        no_result = []
        if manifest and os.path.exists(manifest):
            no_result = sorted(set(json.load(open(manifest))) - seen)
        bad = (len(buckets["FAIL_CONTENT"]) + len(buckets["FAIL_RESOURCE"])
               + len(buckets["ORACLE_TIMEOUT"]) + len(no_result))
        print(f"gate: {len(buckets['PASS'])} green, "
              f"{len(buckets['FAIL_CONTENT'])} content-fail, "
              f"{len(buckets['FAIL_RESOURCE'])} resource-fail, "
              f"{len(buckets['ORACLE_TIMEOUT'])} timeout, "
              f"{len(no_result)} no-result"
              + (f" ({' '.join(no_result[:10])})" if no_result else ""))
        sys.exit(0 if bad == 0 else 1)

    if mode == "--ledger":
        manifest = argv[2] if len(argv) > 2 else None
        seen = {n for b in buckets.values() for n, _ in b}
        no_result = []
        if manifest and os.path.exists(manifest):
            no_result = sorted(set(json.load(open(manifest))) - seen)
        total = len(seen) + len(no_result)
        print(f"### Lane ledger — `{path}`\n")
        print(f"| bucket | n | queries |")
        print(f"|---|---|---|")
        rows = [
            ("hash-green", buckets["PASS"]),
            ("content FAIL (divergence)", buckets["FAIL_CONTENT"]),
            ("oracle resource FAIL (post-retry)", buckets["FAIL_RESOURCE"]),
            ("oracle timeout (post-retry)", buckets["ORACLE_TIMEOUT"]),
        ]
        for label, b in rows:
            names = " ".join(n for n, _ in b) if len(b) <= 40 else \
                f"{len(b)} queries (all not otherwise listed)"
            print(f"| {label} | {len(b)} | {names} |")
        if no_result:
            print(f"| engine-side no-result (see verify.log) | "
                  f"{len(no_result)} | {' '.join(no_result)} |")
        print(f"| **total attempted** | **{total}** | |")
        if transitions:
            print("\n**Retry transitions** (first-pass → final):\n")
            for n, t in sorted(transitions):
                print(f"- `{n}`: {t}")
        fails = buckets["FAIL_CONTENT"] + buckets["FAIL_RESOURCE"] + \
            buckets["ORACLE_TIMEOUT"]
        if fails:
            print("\n**Non-green detail** (last record per query):\n")
            for n, d in sorted(fails):
                print(f"- `{n}`: {d}")
        if other:
            print("\n**Malformed records** (truncated lines from a killed run):\n")
            for d in other:
                print(f"- {d}")
        return

    # default: human summary
    for k in ("PASS", "ORACLE_TIMEOUT"):
        print(f"{k}: {len(buckets[k])}")
    print(f"FAIL_RESOURCE: {len(buckets['FAIL_RESOURCE'])}")
    for n, d in buckets["FAIL_RESOURCE"]:
        print(f"  {n}")
    print(f"FAIL_CONTENT: {len(buckets['FAIL_CONTENT'])}")
    for n, d in buckets["FAIL_CONTENT"]:
        print(f"  {n}: {d}")
    if buckets["ORACLE_TIMEOUT"]:
        print("timeouts:", " ".join(n for n, _ in buckets["ORACLE_TIMEOUT"]))
    if transitions:
        print("transitions:")
        for n, t in transitions:
            print(f"  {n}: {t}")
    if other:
        print("other:")
        for d in other:
            print(" ", d)


if __name__ == "__main__":
    main(sys.argv[1:])
